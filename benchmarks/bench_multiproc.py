"""Multi-process scaling efficiency on a CPU device mesh (BASELINE's
N >= 2 hosts metric, measured as far as this single-host environment
allows).

No second TPU host is reachable, so this holds the GLOBAL device count
fixed at 8 virtual CPU devices and compares one process owning all 8
against two jax.distributed processes owning 4 each — the ratio
isolates the multi-process machinery's overhead (cross-process
collectives, global-array assembly) from compute. tests/test_parallel.py
separately asserts the 2-process image is bit-identical.

Run: python benchmarks/bench_multiproc.py
"""
import json
import os
import subprocess
import sys
import time

BASE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(BASE, "mp_bench_worker.py")


def run(num_procs, dev_per_proc, deadline_s=420):
    # Fresh port per invocation so a crashed/stale cluster (TIME_WAIT,
    # concurrent bench) can't wedge the rendezvous.
    port = int(os.environ.get("RRAY_MP_PORT", 12000 + os.getpid() % 20000))
    env = dict(os.environ, RRAY_MP_COORD=f"127.0.0.1:{port}")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(num_procs), str(i), str(dev_per_proc)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(num_procs)]
    try:
        t0 = time.time()
        while any(p.poll() is None for p in procs):
            if time.time() - t0 > deadline_s:
                raise TimeoutError(f"{num_procs}-proc bench exceeded "
                                   f"{deadline_s}s")
            time.sleep(0.5)
        sec = None
        for i, p in enumerate(procs):
            out = p.stdout.read()
            assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
            for line in out.splitlines():
                if line.startswith("median_frame_s"):
                    sec = float(line.split()[1])
        assert sec is not None, "proc 0 reported no timing"
        return sec
    finally:
        # One dead/stuck worker must not leave siblings holding the port.
        for p in procs:
            if p.poll() is None:
                p.kill()


def main():
    t1 = run(1, 8)
    t2 = run(2, 4)
    eff = t1 / t2
    print(json.dumps({
        "metric": "multiprocess_efficiency_2proc_cpu",
        "value": eff,
        "unit": "ratio (1proc_time / 2proc_time at fixed 8 devices)",
        "frame_s_1proc": t1,
        "frame_s_2proc": t2,
        "vs_baseline": eff / 0.85,
        "note": "virtual CPU mesh; no second TPU host reachable — "
                "2-process output asserted bit-identical in tests",
    }), flush=True)


if __name__ == "__main__":
    main()
