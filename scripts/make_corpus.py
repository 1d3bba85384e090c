"""Generate the benchmark mission corpus (the reference's 279-mission
analog: empty/{10..60}agents x seeds, circle/square sets) as JSON files in
the reference schema.

Usage: python scripts/make_corpus.py out_dir [--seeds 30]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from lsc_planner_tpu.missions import (make_circle_mission,  # noqa: E402
                                      make_square_mission,
                                      make_random_mission)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seeds", type=int, default=30)
    ap.add_argument("--agents", type=int, nargs="*",
                    default=[10, 20, 30, 40, 50, 60])
    args = ap.parse_args()

    count = 0
    # named benchmark shapes
    named = {
        "multi_circle20.json": make_circle_mission(
            20, radius=8.0, world=(-10, -10, 0, 10, 10, 2.5)),
        "multi_square8.json": make_square_mission(8),
        "multi_square16.json": make_square_mission(16),
        "multi_simple4.json": make_square_mission(4),
    }
    os.makedirs(args.out_dir, exist_ok=True)
    for name, m in named.items():
        m.save(os.path.join(args.out_dir, name))
        count += 1

    # random empty-world sweeps (empty/{N}agents/*.json analog)
    for qn in args.agents:
        d = os.path.join(args.out_dir, "empty", f"{qn}agents")
        os.makedirs(d, exist_ok=True)
        world = (-5, -5, 0, 5, 5, 2.5) if qn <= 30 else \
            (-8, -8, 0, 8, 8, 2.5)
        for seed in range(args.seeds):
            m = make_random_mission(qn, world=world, z=1.0, seed=seed)
            m.save(os.path.join(d, f"random_{qn}agents_{seed}.json"))
            count += 1

    print(f"wrote {count} missions under {args.out_dir}")


if __name__ == "__main__":
    main()
