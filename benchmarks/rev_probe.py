"""Probe: does Mosaic lower lax.rev (and at what cost) in a TPU kernel?

Round-2 finding (CLAUDE.md perf notes): Mosaic did NOT support lax.rev
inside pallas kernels, which is why the mega-kernel applies dihedral
flips as a flip-conjugated XLA epilogue (~2.9 us/img of the ~30 us/img
chain).  This probe re-checks on the current jax/libtpu: if rev lowers
and is cheap, the epilogue can fold into the kernel and the tail cost
disappears.  Run on real TPU hardware (remote pallas compiles take
minutes through the tunnel; run in a background task).

Usage: python benchmarks/rev_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 512


def k_rev_lane(x_ref, o_ref):
    o_ref[...] = lax.rev(x_ref[...], (1,))


def k_rev_sublane(x_ref, o_ref):
    o_ref[...] = lax.rev(x_ref[...], (0,))


def k_copy(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def k_roll(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], 7, 1)


def compile_one(name, kernel):
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, S), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = jnp.arange(S * S, dtype=jnp.int32).reshape(S, S)
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(jax.jit(fn)(x))
        dt = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001 — the probe's whole point
        print(f"[{name}] FAILS TO LOWER: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")
        return None
    import numpy as np

    ref = {
        "rev_lane": np.asarray(x)[:, ::-1],
        "rev_sublane": np.asarray(x)[::-1, :],
        "copy": np.asarray(x),
        "roll": np.roll(np.asarray(x), 7, 1),
    }[name]
    okstr = "OK" if (np.asarray(out) == ref).all() else "WRONG RESULT"
    print(f"[{name}] lowers, compile+run {dt:.1f}s, {okstr}")
    return fn


def bench(name, fn, iters=3000):
    """fori-loop protocol: all iterations inside one jit, data dependency
    threaded through every call (CLAUDE.md benchmark protocol)."""
    x = jnp.arange(S * S, dtype=jnp.int32).reshape(S, S)

    @jax.jit
    def loop(x):
        def body(i, acc):
            return fn(acc + i)

        return lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(loop(x))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(x))
    dt = time.perf_counter() - t0
    print(f"[{name}] {dt / iters * 1e6:.2f} us/iter ({S}x{S} int32)")
    return dt / iters


def main():
    print(f"jax {jax.__version__}, backend {jax.default_backend()}, "
          f"device {jax.devices()[0].device_kind}")
    fns = {}
    for name, k in (("copy", k_copy), ("roll", k_roll),
                    ("rev_lane", k_rev_lane), ("rev_sublane", k_rev_sublane)):
        fns[name] = compile_one(name, k)
    for name, fn in fns.items():
        if fn is not None:
            bench(name, fn)


if __name__ == "__main__":
    main()
