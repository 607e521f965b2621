"""Pairing-engine semantics (reference pipeline.py:148-235)."""

import random
from pathlib import Path

import pytest

from image_processor_pipeline_tpu.pairing import generate_processing_inputs


def _paths(prefix, n):
    return [Path(f"{prefix}{i:03d}.jpg") for i in range(n)]


class TestOneInput:
    def test_yields_singletons(self):
        files = _paths("a", 5)
        it, total = generate_processing_inputs([files], "one_input")
        assert total == 5
        assert list(it) == [(f,) for f in files]

    def test_rejects_multiple_dirs(self):
        with pytest.raises(ValueError):
            generate_processing_inputs([_paths("a", 2), _paths("b", 2)], "one_input")


class TestZip:
    def test_truncates_to_shortest(self):
        a, b = _paths("a", 5), _paths("b", 3)
        it, total = generate_processing_inputs([a, b], "zip")
        pairs = list(it)
        assert total == 3 and len(pairs) == 3
        assert pairs[0] == (a[0], b[0])

    def test_three_dirs(self):
        a, b, c = _paths("a", 4), _paths("b", 4), _paths("c", 4)
        it, total = generate_processing_inputs([a, b, c], "zip")
        assert next(it) == (a[0], b[0], c[0])


class TestModulo:
    def test_cycles_shuffled_seconds(self):
        a, b = _paths("a", 7), _paths("b", 3)
        rng = random.Random(0)
        it, total = generate_processing_inputs([a, b], "modulo", rng=rng)
        pairs = list(it)
        assert total == 7 and len(pairs) == 7
        # each first-list file appears once, in order
        assert [p[0] for p in pairs] == a
        # seconds cycle with period 3 (shuffled order)
        assert [p[1] for p in pairs[:3]] == [p[1] for p in pairs[3:6]]
        assert set(p[1] for p in pairs) == set(b)

    def test_requires_two_dirs(self):
        with pytest.raises(ValueError):
            generate_processing_inputs([_paths("a", 2)], "modulo")


class TestSample:
    def test_30_percent_flags(self):
        files = _paths("a", 100)
        rng = random.Random(1)
        it, total = generate_processing_inputs([files], "sample", rng=rng)
        rows = list(it)
        assert total == 100
        assert sum(r[1] for r in rows) == 30  # blur flags
        assert sum(r[2] for r in rows) == 30  # rgb flags
        # flags drawn independently
        assert [r[1] for r in rows] != [r[2] for r in rows]

    def test_reproducible_with_seed(self):
        files = _paths("a", 50)
        r1 = list(generate_processing_inputs([files], "sample", rng=random.Random(7))[0])
        r2 = list(generate_processing_inputs([files], "sample", rng=random.Random(7))[0])
        assert r1 == r2


class TestCustom:
    def test_custom_function(self):
        files = _paths("a", 4)

        def pair_fn(lists):
            return [(f, f) for f in lists[0]]

        it, total = generate_processing_inputs(
            [files], "custom", pairing_function=pair_fn
        )
        assert total == 4
        assert list(it) == [(f, f) for f in files]

    def test_custom_requires_function(self):
        with pytest.raises(ValueError):
            generate_processing_inputs([_paths("a", 2)], "custom")


class TestSampleK:
    def test_aligned_subsample(self):
        a, b = _paths("a", 10), _paths("b", 10)
        rng = random.Random(3)
        it, total = generate_processing_inputs([a, b], "zip", sample_k=4, rng=rng)
        pairs = list(it)
        assert total == 4
        # alignment: indices match between lists
        for fa, fb in pairs:
            assert fa.stem[1:] == fb.stem[1:]

    def test_unequal_lists_no_crash(self):
        # the reference crashes here (SURVEY.md §2.7 #11); we sample from
        # the shortest list
        a, b = _paths("a", 10), _paths("b", 4)
        it, total = generate_processing_inputs([a, b], "zip", sample_k=6,
                                               rng=random.Random(5))
        assert total == 4  # clamped to min list length
