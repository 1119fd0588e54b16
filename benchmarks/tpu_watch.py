"""Opportunistic TPU bench watcher.

The axon tunnel is down for hours at a time, with windows in between
(VERDICT r3 "What's weak" #1: the round's number is lost if the single
end-of-round bench invocation lands in an outage window).  This script
loops for a whole session: probe the backend in a bounded subprocess
every few minutes, and the moment a window opens, run `bench.py` and
snapshot the full result (headline JSON + stderr tail with roofline,
preflight, and extras lines) to a committed
`benchmarks/results/BENCH_TPU_<utc>.json` so one good window is never
lost to a later crash.

Run it in the background for the session:
    python benchmarks/tpu_watch.py >> /tmp/mg_tpu_watch.log 2>&1 &
Exits after the first successful TPU-backed bench run (the extras pass
measures the ee config, the frozen-LM A/B and the chol-solve preflight
in the same window), or after --max-hours.
"""

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "jnp.zeros((8,)).sum().block_until_ready();"
    "print('PROBE_BACKEND', jax.default_backend())"
)


def log(msg: str) -> None:
    ts = datetime.datetime.now(datetime.timezone.utc).strftime("%H:%M:%S")
    print(f"[{ts}] {msg}", flush=True)


def probe(timeout_s: int = 120) -> bool:
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                           capture_output=True, text=True, timeout=timeout_s)
        return p.returncode == 0 and "PROBE_BACKEND tpu" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def run_bench(timeout_s: int) -> dict | None:
    """Run bench.py; return the parsed result dict on a REAL TPU run."""
    env = dict(os.environ)
    env["MG_BENCH_PLATFORM"] = "tpu"  # the probe just succeeded; skip re-probe
    env["MG_BENCH_SNAPSHOT"] = "0"  # the watcher owns the snapshot artifact
    try:
        p = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                           capture_output=True, text=True,
                           timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired as e:
        # the headline JSON prints before the extras pass: salvage it
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        log(f"bench timed out after {timeout_s}s; salvaging partial output")
        result = _parse(out, err, rc=-1)
        if result is not None:
            result["partial"] = True  # headline only; extras/A-Bs missing
        return result
    result = _parse(p.stdout, p.stderr, rc=p.returncode)
    if result is not None and p.returncode != 0:
        # headline JSON landed but the process died mid-extras: bank it,
        # but keep hunting for a complete window (same as a timeout)
        result["partial"] = True
    return result


def _parse(stdout: str, stderr: str, rc: int) -> dict | None:
    headline = None
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                headline = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if headline is None:
        log(f"bench produced no JSON line (rc={rc}); stderr tail: "
            + "|".join(stderr.strip().splitlines()[-3:]))
        return None
    if "fallback" in headline:
        log(f"bench fell back ({headline['fallback']}); window closed mid-run")
        return None
    result = {
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "headline": headline,
        "bench_rc": rc,
        "stderr_tail": stderr.strip().splitlines()[-60:],
    }
    # bank the post-headline live A/B verdicts as PROPER fields so
    # bench.banked_toggle_decision can read them from watcher snapshots
    # (with MG_BENCH_SNAPSHOT=0 bench.py itself banks nothing)
    for label, key in (("lm-solve", "lm_solve_preflight_live"),
                       ("lm-delta", "lm_delta_preflight_live")):
        for line in stderr.splitlines():
            line = line.rstrip()
            if (line.startswith(f"# {label} live preflight:")
                    and line[-4:] in ("-> 0", "-> 1")):
                result[key] = line[-1]
    return result


def snapshot(result: dict) -> str:
    stamp = result["utc"].replace(":", "").replace("-", "").replace("+0000", "Z")
    rel = f"benchmarks/results/BENCH_TPU_{stamp}.json"
    path = os.path.join(REPO, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    log(f"snapshot written: {rel}")
    for attempt in range(5):  # index.lock may race the interactive session
        add = subprocess.run(["git", "add", rel], cwd=REPO,
                             capture_output=True, text=True)
        com = subprocess.run(
            ["git", "commit", "-m",
             "Bank a TPU benchmark snapshot from an open tunnel window",
             "--only", rel], cwd=REPO, capture_output=True, text=True)
        if add.returncode == 0 and com.returncode == 0:
            log("snapshot committed")
            return path
        time.sleep(20 * (attempt + 1))
    log("snapshot commit FAILED (file is still on disk): "
        + (com.stderr or com.stdout).strip()[-200:])
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-hours", type=float, default=11.0)
    ap.add_argument("--interval", type=float, default=420,
                    help="seconds between probes")
    ap.add_argument("--bench-timeout", type=float, default=2700)
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    n = 0
    while time.time() < deadline:
        n += 1
        t0 = time.time()
        if probe():
            log(f"probe #{n}: TPU UP — running bench.py")
            result = run_bench(int(args.bench_timeout))
            if result is not None:
                snapshot(result)
                if result.get("partial"):
                    # a salvaged headline is banked, but the extras/A-B
                    # lines the docstring promises are missing — keep
                    # hunting for a window long enough for a complete run
                    log("partial result banked; continuing to hunt for a "
                        "complete window")
                else:
                    log("done: TPU number banked")
                    return
        else:
            log(f"probe #{n}: down ({time.time() - t0:.0f}s)")
        time.sleep(max(0.0, args.interval - (time.time() - t0)))
    log("max-hours reached without a TPU window")


if __name__ == "__main__":
    main()
