#!/usr/bin/env python
"""AOT-compile the align stage's fused driver program for a ladder rung.

Companion to precompile_count.py: replicates GeomDeviceAligner._upload's
array shapes for a uniform-length rung fixture (total bases + window
slack padding — shapes are exact, not bucketed) and compiles the
TR_NARROW fused program via ShapeDtypeStructs, so the align stage (or a
stall-killed retry) starts hot.  The WIDE escalation tier compiles
lazily on first band overflow (seconds; zero overflows at ladder rungs
so far), so only the primary program is warmed.

  python tools/precompile_align.py --reads 1425000 --read-len 8000
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_425_000)
    ap.add_argument("--read-len", type=int, default=8_000)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--driver", choices=["geom", "blocks"], default="blocks",
                    help="which fused driver to warm: the uint32-offset "
                         "geom driver or the block-addressed driver "
                         "(align/xdrop_device_blocks.py)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    import elba_tpu  # noqa: F401
    from elba_tpu.align import xdrop_device_geom as dg
    from elba_tpu.align.xdrop_geom import WIDE
    from elba_tpu.align.xdrop_tr import TR_NARROW

    n, total = args.reads, args.reads * args.read_len
    winpad = max(g.qw + g.tw for g in (TR_NARROW, WIDE))

    B = args.batch
    sds = jax.ShapeDtypeStruct
    i32 = lambda *shape: sds(shape, jnp.int32)

    if args.driver == "blocks":
        # mirror BlockDeviceAligner._upload: block count from the real
        # placement over a uniform-length readset
        import numpy as np
        from elba_tpu.align import xdrop_device_blocks as db
        nblk, _, _ = db.place_blocks(
            np.full(n, args.read_len, np.int64), winpad, db.BLK_BYTES)
        nblk = max(nblk, 1)
        print(f"[precompile-align] blocks driver: nblk={nblk} reads={n} "
              f"batch={B}", flush=True)
        t0 = time.time()
        with jax.enable_x64(False):
            db._align_batch_fused_blocks.lower(
                TR_NARROW, 2 * B, args.k,
                sds((nblk, db.BLK_BYTES), jnp.uint8),
                i32(n), i32(n), i32(n), i32(n),
                i32(B), i32(B), i32(B), i32(B),
                i32(), i32(), i32(), i32(), False).compile()
        print(f"[precompile-align] fused TR_NARROW blocks program: "
              f"{time.time() - t0:.0f}s", flush=True)
        return

    # mirror GeomDeviceAligner._upload's padding exactly (geom only:
    # its byte offsets cap the resident set at 2^31 packed bytes)
    codes_len = winpad + total + winpad + ((-(total + 2 * winpad)) % 128)
    packed_len = codes_len // 4 + 1
    assert packed_len < 2 ** 31, \
        "geom driver caps at 2^31 packed bytes; use --driver blocks"
    print(f"[precompile-align] packed_len={packed_len} reads={n} "
          f"batch={B}", flush=True)

    t0 = time.time()
    with jax.enable_x64(False):
        dg._align_batch_fused_geom.lower(
            TR_NARROW, 2 * B, args.k,
            sds((packed_len,), jnp.uint8),
            sds((n,), jnp.uint32), i32(n), i32(n),
            i32(B), i32(B), i32(B), i32(B),
            i32(), i32(), i32(), i32(), False).compile()
    print(f"[precompile-align] fused TR_NARROW program: "
          f"{time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
