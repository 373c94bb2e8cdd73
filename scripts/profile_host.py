"""Profile the host data-prep stage (decode + keypoints + masks + prep).

Times each sub-stage of load_person + host_prepare over the fixture pairs
to direct host-side optimization (VERDICT r2 missing #2: 22.7 pairs/s on
this 1-core host vs 241 img/s chip-side).

Usage: python scripts/profile_host.py [--reps 10]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = "/root/reference/test_datas"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--mode", default="upper")
    ap.add_argument("--cond", default="host", choices=("host", "device"),
                    help="device = defer pose/palm/retain/skin to the chip")
    args = ap.parse_args()

    from pasta_tpu.data import preprocess as pp
    from pasta_tpu.serving import host_prepare

    with open(os.path.join(FIXTURES, "test_pairs.txt")) as f:
        pairs = [line.split() for line in f if line.strip()]

    pose_raster = "device" if args.cond == "device" else "host"

    def run_all():
        for clothes_name, person_name in pairs:
            person = pp.load_person(FIXTURES, person_name,
                                    pose_raster=pose_raster)
            clothes = pp.load_person(FIXTURES, clothes_name,
                                     with_garment_parsing=True)
            host_prepare(person, clothes, args.mode, cond=args.cond)

    run_all()  # warm page cache / lazy imports

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run_all()
        times.append(time.perf_counter() - t0)
    # best rep = least ambient interference on this shared 1-core host
    dt = min(times)
    print(f"host stage: {len(pairs) / dt:.1f} pairs/s "
          f"({dt / len(pairs) * 1e3:.1f} ms/pair, best of {args.reps}; "
          f"median {len(pairs) / sorted(times)[len(times) // 2]:.1f})")

    prof = cProfile.Profile()
    prof.enable()
    for _ in range(args.reps):
        run_all()
    prof.disable()
    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(35)
    print(s.getvalue())


if __name__ == "__main__":
    main()
