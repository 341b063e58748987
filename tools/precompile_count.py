#!/usr/bin/env python
"""AOT-compile the count stage's device programs for a ladder rung.

Remote compiles of 33M+-slot sort programs can take >25 minutes
(CLAUDE.md), during which a running count stage prints NOTHING — the
orchestrator's stall watchdog can then kill it MID-COMPILE, losing the
compile (the persistent cache only records finished programs) and
looping.  This tool lowers + compiles the exact programs a
`run_ladder.py --stage count` dispatch will request — from a SEPARATE
process, via ShapeDtypeStructs only (nothing executes on the chip, no
HBM is touched) — so a killed stage's retry starts from a warm cache.

The sizing math below mirrors run_ladder.stage_count +
kmers.count_tokens.iter_count_parts_tokens +
dsparse.seedmat_device.spgemm_from_count_parts for a UNIFORM-length
synthetic rung (tools/simulate.py fixtures).  Programs are keyed by
shapes/statics, so an exact replica here IS the stage's cache entry.

  python tools/precompile_count.py --reads 1425000 --read-len 8000 \
      --genome 380000000 --lower 15 --upper 35
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _FakeReadSet:
    """Shape/length shim for plan_parts (uniform-length rung fixtures)."""

    def __init__(self, n, read_len):
        import numpy as np
        self.lengths = np.full(n, read_len, np.int32)
        self.max_length = read_len

    def __len__(self):
        return len(self.lengths)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_425_000)
    ap.add_argument("--read-len", type=int, default=8_000)
    ap.add_argument("--genome", type=int, default=380_000_000)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--lower", type=int, default=15)
    ap.add_argument("--upper", type=int, default=35)
    ap.add_argument("--token-budget", type=int, default=2_500_000_000)
    ap.add_argument("--stage-chunks", type=int, default=4)
    ap.add_argument("--count-budget", type=int, default=58_000_000,
                    help="per-part instance budget (mirror run_ladder "
                         "--count-budget)")
    ap.add_argument("--spgemm-slots", type=int, default=1 << 25,
                    help="mirror run_ladder --spgemm-slots")
    ap.add_argument("--b-cap", type=int, default=0,
                    help="mirror run_ladder --b-cap")
    ap.add_argument("--spgemm-pend", type=int, default=0,
                    help="mirror run_ladder --spgemm-pend")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp
    import numpy as np

    import elba_tpu  # noqa: F401  (enables x64, as the stage does)
    from elba_tpu.kmers import count_tokens as ct
    from elba_tpu.kmers.count_chunked import COMPILE_CAP, _pow2, plan_parts
    from elba_tpu.dsparse import seedmat_device as sd

    k, lower, upper = args.k, args.lower, args.upper
    n, read_len = args.reads, args.read_len
    readset = _FakeReadSet(n, read_len)
    total = n * (read_len - (k - 1))

    # --- run_ladder.stage_count sizing (auto multi-pass path) ---
    budget = args.count_budget
    cap = -(-(budget * 105 // 100 + 34_000_000) // 1024) * 1024
    parts = max(2, -(-total // budget))
    total_bases = n * read_len
    expected_pairs = int(n * total_bases / max(args.genome, 1))
    b_cap = 0
    if expected_pairs * 14 // 10 > (1 << 24):
        b_cap = -(-(expected_pairs * 14 // 10) // 1024) * 1024
    b_cap = max(b_cap, 1 << 24)
    if args.b_cap:
        b_cap = args.b_cap

    # --- iter_count_parts_tokens sizing ---
    rc, cap_auto, _ = plan_parts(readset, k, parts, 0, min_len=32)
    cap = min(cap or cap_auto, COMPILE_CAP)
    L = max(_pow2(max(read_len, k + 1)), 32)
    W = L - k + 1
    Rpad = -(-max(n, 1) // rc) * rc
    C = Rpad // rc
    slack = 1.2
    sweeps = max(1, -(-int(total * slack * 4) // args.token_budget))
    group = max(1, -(-parts // sweeps))
    group = min(group, ct.MAX_GROUP, parts)
    expected = total * group / parts
    token_cap = int(expected * slack) + rc * W
    token_cap = -(-token_cap // 1024) * 1024
    part_cap = min(ct._bucket(total // parts), cap)

    print(f"[precompile-count] parts={parts} rc={rc} cap={cap} "
          f"group={group} token_cap={token_cap} part_cap={part_cap} "
          f"b_cap={b_cap}", flush=True)

    sds = jax.ShapeDtypeStruct
    # resident words: FLAT u32 halves (count_tokens._combine_u64)
    wpr1 = L // 32 + 1
    w32 = sds((Rpad * wpr1,), jnp.uint32)
    lengths = sds((Rpad,), jnp.int32)
    bvec = sds((group + 1,), jnp.uint64)
    i32 = lambda *shape: sds(shape, jnp.int32)

    def compile_(name, lowered):
        t0 = time.time()
        lowered.compile()
        print(f"[precompile-count] {name}: {time.time() - t0:.0f}s",
              flush=True)

    C_ = Rpad // rc
    tokbuf_s = sds((token_cap,), jnp.int32)
    counts_s = sds((C_, group), jnp.int32)
    f_s = sds((), jnp.int32)
    ovf_s = sds((), jnp.bool_)
    for nc in sorted({min(ct.FILL_CHUNK_BATCH, C_),
                      C_ % ct.FILL_CHUNK_BATCH or ct.FILL_CHUNK_BATCH}):
        compile_(f"_fill_tokens_range(nc={nc})", ct._fill_tokens_range.lower(
            w32, w32, lengths, bvec, tokbuf_s, f_s, counts_s, ovf_s, f_s,
            k=k, read_chunk=rc, cap_tok=token_cap, group=group, nc=nc))

    compile_("_part_from_tokens", ct._part_from_tokens.lower(
        w32, w32, sds((token_cap,), jnp.int32), i32(C), i32(C), i32(),
        k=k, read_chunk=rc, cap=part_cap, lower=lower, upper=upper,
        wpr1=wpr1))

    # --- spgemm_from_count_parts shapes (first part fixes CI geometry) ---
    span = upper - 1
    CI_budget = max(args.spgemm_slots // span, 1 << 18)
    N = part_cap
    CI_max = min(CI_budget, _pow2(max(N, 1 << 10)))
    chunk_slots_max = CI_max * span
    CI = min(CI_max, _pow2(max(N, 1 << 10)))
    npad = _pow2(-(-N // CI) * CI + 2 * upper)
    out_cap = min(b_cap, sd._out_cap_max(chunk_slots_max, CI_max))
    pend_cap = sd._pend_cap_for(out_cap, chunk_slots_max, CI_max)
    if args.spgemm_pend:
        wl = sd._live_window(chunk_slots_max, CI_max)
        pend_cap = min(max(args.spgemm_pend, wl + 1024),
                       sd.COMPILE_CAP - out_cap)
    print(f"[precompile-count] CI={CI} npad={npad} out_cap={out_cap} "
          f"pend_cap={pend_cap}", flush=True)

    i64 = sds((), jnp.int64)
    state = (i32(out_cap), i32(out_cap), i32(out_cap), i32(out_cap),
             i32(out_cap), i64, i32(pend_cap), i32(pend_cap),
             i32(pend_cap), i32())

    compile_("_relayout_from_count", sd._relayout_from_count.lower(
        i32(N), i32(N), i32(N), i64, upper=upper, npad=npad))

    rel_out = jax.eval_shape(
        lambda r, p, g, z: sd._relayout_from_count(
            r, p, g, z, upper=upper, npad=npad),
        i32(N), i32(N), i32(N), i64)

    compile_("_spgemm_stage", sd._spgemm_stage.lower(
        *rel_out, i32(), i32(), state, chunk_inst=CI, out_cap=out_cap,
        full=False, upper=upper, steps=args.stage_chunks,
        two_seeds=False))

    compile_("_flush_state", sd._flush_state.lower(
        state, two_seeds=False))

    compile_("_finalize_state", sd._finalize_state.lower(
        state, min_shared=2, two_seeds=False))

    print("[precompile-count] done", flush=True)


if __name__ == "__main__":
    main()
