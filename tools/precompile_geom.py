#!/usr/bin/env python
"""AOT-compile the geometry x-drop kernels on the remote compile helper.

Remote Mosaic compiles take 10-45 minutes per kernel shape (CLAUDE.md);
this tool populates the persistent compilation cache WITHOUT executing
anything on the chip (jit .lower().compile() only), so it can run while a
ladder stage owns the device and the post-run bench/sweep starts hot.

  python tools/precompile_geom.py            # bench-shape fused narrow
  python tools/precompile_geom.py --variants # + kernel-only sweep shapes
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", action="store_true",
                    help="also compile kernel-only sweep variants")
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    import bench
    from elba_tpu.align import xdrop_device_geom as dg
    from elba_tpu.align.xdrop_geom import (Geometry, NARROW, WIDE,
                                           pallas_extend_geom)

    rs, qi, ti, bq, bt, _, _ = bench.make_xdrop_fixture()
    al = dg.GeomDeviceAligner(batch=args.batch)
    al._upload(rs)
    B = args.batch
    sds = lambda shape: jax.ShapeDtypeStruct(shape, jnp.int32)

    t0 = time.time()
    with jax.enable_x64(False):
        lowered = dg._align_batch_fused_geom.lower(
            NARROW, 2 * B, 17, al._dev["codes"], al._dev["offB"],
            al._dev["offR"], al._dev["lengths"],
            sds((B,)), sds((B,)), sds((B,)), sds((B,)),
            sds(()), sds(()), sds(()), sds(()), False)
        lowered.compile()
    print(f"[precompile] fused narrow bench program: "
          f"{time.time() - t0:.0f}s")

    if args.variants:
        for name, g in (("narrow-u32", Geometry(unroll=32)),
                        ("wide", WIDE)):
            t0 = time.time()
            with jax.enable_x64(False):
                fn = jax.jit(pallas_extend_geom, static_argnums=(0, 5))
                N = 2 * B
                fn.lower(g, sds((N, 128)),
                         jax.ShapeDtypeStruct((N, g.qw), jnp.int8),
                         jax.ShapeDtypeStruct((N, g.tw), jnp.int8),
                         sds((N, 2, g.wwin)), False).compile()
            print(f"[precompile] kernel-only {name}: "
                  f"{time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
