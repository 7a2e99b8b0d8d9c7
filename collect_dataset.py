#!/usr/bin/env python
"""Expert data-collection orchestration.

Counterpart of reference `collect_dataset_slurm.py`: per-route expert jobs
(DATAGEN leaderboard runs with the data-collection agent), log-scanning
auto-cancel + resubmission, live-tunable concurrency (max_num_jobs.txt).
Afterwards the label generators run over the collected routes.

    python collect_dataset.py --routes-dir <xmls> --save-root database/simlingo
    python collect_dataset.py --labels-only --save-root database/simlingo
"""

import argparse
import glob
import os


def run_label_generation(save_root: str) -> None:
    from simlingo_tpu.labels import buckets, commentary, dreamer_gen, vqa

    pattern = os.path.join(save_root, "data", "simlingo", "*", "*", "*", "Town*")
    routes = sorted(glob.glob(pattern))
    print(f"label generation over {len(routes)} routes")
    for r in routes:
        commentary.generate_route_commentary(r)
        vqa.generate_route_vqa(r)
        dreamer_gen.generate_route_dreamer(r)
    stats = buckets.generate_buckets(
        save_root, os.path.join(save_root, "bucketsv2_simlingo"))
    print(f"buckets: {len(stats)} classes, {sum(stats.values())} assignments")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--routes-dir", default=None)
    ap.add_argument("--save-root", required=True)
    ap.add_argument("--leaderboard",
                    default="leaderboard/leaderboard/leaderboard_evaluator.py")
    ap.add_argument("--max-jobs", type=int, default=4)
    ap.add_argument("--base-port", type=int, default=2000)
    ap.add_argument("--slurm", action="store_true")
    ap.add_argument("--labels-only", action="store_true")
    ap.add_argument("--microsim", action="store_true",
                    help="collect with the in-repo microsim (no CARLA): "
                         "one babysat job per MicroBench route")
    ap.add_argument("--suite", default="micro",
                    help="microsim suite: micro (51 routes) or b2d220 "
                         "(Bench2Drive protocol, 44 types x 5 variants)")
    args = ap.parse_args()

    if args.microsim and not args.labels_only:
        from simlingo_tpu.orchestration.babysitter import (Babysitter, Job,
                                                           LocalBackend)
        from simlingo_tpu.sim.suite import SUITES
        collect_root = os.path.join(args.save_root, "data", "simlingo",
                                    "v1", "micro", "routes_training")
        log_dir = os.path.join(args.save_root, "logs")
        result_dir = os.path.join(args.save_root, "microsim_results")
        os.makedirs(result_dir, exist_ok=True)
        jobs = []
        for spec in SUITES[args.suite]():
            rid = spec["route_id"]
            done = os.path.join(collect_root, f"Town12_{rid}",
                                "results.json.gz")
            cmd = ["python", "-m", "simlingo_tpu.sim.suite",
                   "--suite", args.suite,
                   "--agent", "expert", "--routes", rid,
                   "--collect", collect_root,
                   "--out", os.path.join(result_dir, f"{rid}.json")]
            jobs.append(Job(name=rid, cmd=cmd, done_file=done,
                            log_path=os.path.join(log_dir, f"{rid}.log")))
        sitter = Babysitter(jobs, LocalBackend(),
                            max_jobs_file="max_num_jobs.txt",
                            max_concurrent=args.max_jobs)
        counts = sitter.run(progress=lambda c: print(c, flush=True))
        print("microsim collection jobs:", counts)
    elif not args.labels_only:
        assert args.routes_dir, "--routes-dir required unless --labels-only"
        from simlingo_tpu.orchestration.babysitter import (Babysitter, Job,
                                                           LocalBackend,
                                                           SlurmBackend)
        routes = sorted(glob.glob(os.path.join(args.routes_dir, "*.xml")))
        jobs = []
        log_dir = os.path.join(args.save_root, "logs")
        for i, route in enumerate(routes):
            name = os.path.splitext(os.path.basename(route))[0]
            save_path = os.path.join(args.save_root, "data", "simlingo",
                                     "v1", "local", "routes_training", name)
            port = args.base_port + 10 * (i % max(args.max_jobs, 1))
            cmd = [
                "python", args.leaderboard,
                f"--routes={route}",
                "--agent=simlingo_tpu/agent/carla_data_agent.py",
                f"--checkpoint={save_path}/results.json.gz",
                f"--port={port}",
            ]
            env_done = os.path.join(save_path, "results.json.gz")
            jobs.append(Job(name=name, cmd=cmd, done_file=env_done,
                            log_path=os.path.join(log_dir, f"{name}.log")))
        backend = SlurmBackend() if args.slurm else LocalBackend()
        sitter = Babysitter(jobs, backend, max_jobs_file="max_num_jobs.txt",
                            max_concurrent=args.max_jobs)
        counts = sitter.run(progress=lambda c: print(c, flush=True))
        print("collection jobs:", counts)

    run_label_generation(args.save_root)


if __name__ == "__main__":
    main()
