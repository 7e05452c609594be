#!/usr/bin/env python
"""Print the single-device vs N-mesh mapping-step cost table (PERF.md).

All numbers are host-computed from static shapes (parallel/costs.py) — run
anywhere, no devices needed:  python tools/dist_cost.py [--mesh 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=8)
    args = ap.parse_args()

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.parallel import costs

    m = DEFAULT.mapping
    s = costs.single_mapping_step_cost(m)
    d = costs.dist_mapping_step_cost(m, args.mesh)
    lc = costs.loop_closure_gather_cost(DEFAULT.loop, m, args.mesh)

    kb = lambda b: f"{b / 1024:.1f} KiB"
    print(f"mapping-step composition at equal state (default caps, "
          f"search_num={m.search_num}, {m.max_iterations} LM iters)")
    print(f"{'':38s} {'single':>14s} {'mesh ' + str(args.mesh):>14s}")
    print(f"{'submap rows sorted/step':38s} "
          f"{s['incremental_merge_rows']:>14,} {d['per_shard_voxel_rows']:>14,}")
    print(f"  (single fast path = incremental merge; mesh = per-shard "
          f"rebuild of own_cap={d['own_cap_keyframes']} kf)")
    print(f"{'full-rebuild rows (worst case)':38s} {s['rebuild_rows']:>14,} "
          f"{d['per_shard_gather_rows']:>14,}")
    print(f"{'LM residual rows/device':38s} {s['lm_residual_rows']:>14,} "
          f"{d['per_shard_lm_residual_rows']:>14,}")
    print(f"{'submap all_gather/device':38s} {'0':>14s} "
          f"{kb(d['submap_allgather_bytes']):>14s}")
    print(f"{'LM psum/device (all iters)':38s} {'0':>14s} "
          f"{kb(d['lm_psum_bytes']):>14s}")
    print(f"{'loop-closure window psum/device':38s} {'0':>14s} "
          f"{kb(lc['psum_bytes_per_device']):>14s}")
    print(f"{'TOTAL collective bytes/step':38s} {'0':>14s} "
          f"{kb(d['total_collective_bytes']):>14s}")


if __name__ == "__main__":
    main()
