#!/usr/bin/env python3
"""Probe Mosaic `tpu.dynamic_gather` support on the current TPU/jax.

The synthesis kernel design depends on in-kernel table gathers (see
docs/kernel_design.md).  On jax 0.9.0 / v5e the gather is vreg-local;
re-run this after toolchain upgrades to see if a fused Pallas kernel
becomes expressible.
"""

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def probe(shape, maxidx, axis=1):
        tab = jnp.asarray(np.random.randint(-3, 4, shape), jnp.int32)
        idx = jnp.asarray(np.random.randint(0, maxidx, shape), jnp.int32)

        def k(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=axis)

        try:
            out = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx)
            ok = np.array_equal(
                np.asarray(out),
                np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=axis),
            )
            print(f"{shape} axis={axis} maxidx={maxidx}: "
                  f"{'CORRECT' if ok else 'WRONG RESULT'}")
            return ok
        except Exception as e:
            msg = str(e).split("\n")[0][:100]
            print(f"{shape} axis={axis} maxidx={maxidx}: FAIL {msg}")
            return False

    print(f"jax {jax.__version__}, devices {jax.devices()}")
    probe((8, 128), 128)
    probe((16, 128), 128)
    probe((8, 256), 256)
    probe((16, 512), 512)
    probe((16, 8192), 128)
    probe((16, 8192), 8192)
    probe((128, 128), 128, axis=0)


if __name__ == "__main__":
    main()
