"""Two-process jax.distributed smoke test on the CPU backend.

Spawns 2 subprocesses, each with 4 virtual CPU devices, that run the train
CLI against localhost jax.distributed coordination — exercising the
--coordinator/--num-processes/--process-id bootstrap, the rank-strided
loader split, and make_array_from_process_local_data batch assembly
end-to-end (the reference's NCCL/file:// rendezvous analogue,
train.py:394-401).

Usage: python scripts/multiprocess_smoke.py [--steps 2]
Exits 0 iff both processes finish and report the same final d_loss.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_smoke(steps=2, data="/root/reference/test_datas", devices=8,
              timeout=3000):
    """Run the 2-process smoke; returns (exit_codes, losses, tmpdir).

    Also importable from the test suite (tests/test_multiprocess.py) so the
    --coordinator path cannot rot silently between releases."""
    port = free_port()
    tmp = tempfile.mkdtemp(prefix="mp_smoke_")
    local = devices // 2
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # The container's axon sitecustomize (gated on PALLAS_AXON_POOL_IPS)
        # force-prepends the axon platform at interpreter start — env
        # JAX_PLATFORMS=cpu alone does NOT stick (config ends up
        # "axon,cpu"), and with the tunnel down the subprocesses then hang
        # initializing the axon backend. This smoke is about the CPU-mesh
        # multi-process bootstrap; drop the plugin env entirely.
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={local}")
        env["JAX_NUM_CPU_DEVICES"] = str(local)
        outdir = os.path.join(tmp, f"out{pid}")
        cmd = [
            sys.executable, "-m", "pasta_tpu.cli.train",
            "--outdir", outdir, "--data", data,
            "--cfg", "smoke", "--devices", str(devices),
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--max-steps", str(steps), "--workers", "2",
            "--aug", "noaug", "--gamma", "0",  # one compile variant only:
            # this host has 1 CPU core and both processes compile the step
        ]
        log = open(os.path.join(tmp, f"proc{pid}.log"), "w")
        procs.append((subprocess.Popen(
            cmd, cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT),
            log, outdir))

    rc = [p.wait(timeout=timeout) for p, _, _ in procs]
    for _, log, _ in procs:
        log.close()
    for pid in range(2):
        print(f"--- proc{pid} tail ---")
        with open(os.path.join(tmp, f"proc{pid}.log")) as f:
            print("".join(f.readlines()[-8:]))
    if any(rc):
        return rc, None, tmp

    # Both processes compute on the same global batch -> identical stats.
    losses = []
    for pid in range(2):
        outdir = procs[pid][2]
        run = sorted(os.listdir(outdir))[0]
        path = os.path.join(outdir, run, "stats.jsonl")
        with open(path) as f:
            rows = [json.loads(line) for line in f]
        losses.append(rows[-1]["d_loss"]["mean"])
    return rc, losses, tmp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--data", default="/root/reference/test_datas")
    args = ap.parse_args()

    rc, losses, tmp = run_smoke(steps=args.steps, data=args.data)
    if any(rc):
        print(f"FAIL: exit codes {rc}")
        sys.exit(1)
    print(f"final d_loss per process: {losses}")
    if abs(losses[0] - losses[1]) > 1e-5:
        print("FAIL: processes diverged")
        sys.exit(1)
    print(f"OK: 2-process distributed smoke passed ({tmp})")


if __name__ == "__main__":
    main()
