"""Hardened helpers for real-chip measurements through the axon tunnel.

The remote-compile service backing the tunnel is flaky in two distinct
ways that round-3 artifacts conflated (VERDICT r3 weak #1):

- TRANSPORT failures: ``HTTP 500: tpu_compile_helper subprocess exit
  code 1`` (a compile-service worker died), connection drops,
  ``FailedPrecondition`` backend hiccups. These are transient — the
  pool has several endpoints and a retry usually lands on a healthy
  one. They are NOT measurements and must never be recorded as
  conclusions.
- DEVICE failures: a genuine ``RESOURCE_EXHAUSTED`` from the chip (HBM
  oversubscription). These are real results (e.g. "b=8 bf16 does not
  fit") and should be recorded as such — but only after retries have
  ruled out the transport flavor.

``retry_call`` retries transport failures with backoff and classifies
the terminal error; bench scripts record ``{"oom": true}`` only for the
device flavor. ``prewarm_subprocess`` runs a compile-triggering snippet
in a child process so a wedged compile populates the persistent compile
cache (bench.py _enable_compile_cache) without hanging the parent.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

TRANSPORT_MARKERS = (
    "HTTP 500",
    "remote_compile",
    "FailedPrecondition",
    "FAILED_PRECONDITION",
    "Connection",
    "connection",
    "Deadline",
    "DEADLINE",
    "UNAVAILABLE",
    "Socket",
)
DEVICE_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "ResourceExhausted")


def classify(exc: BaseException) -> str:
    """-> 'transport' | 'device_oom' | 'other'. OOM wins only when no
    transport marker is present (an HTTP 500 wrapping a compile-service
    OOM is still a transport failure — the chip never saw the program)."""
    msg = f"{type(exc).__name__}: {exc}"
    if any(m in msg for m in TRANSPORT_MARKERS):
        return "transport"
    if any(m in msg for m in DEVICE_OOM_MARKERS):
        return "device_oom"
    return "other"


def retry_call(fn, attempts: int = 4, sleep_s: float = 20.0, label: str = ""):
    """Call fn() retrying TRANSPORT failures. Returns ("ok", value) or
    ("device_oom"|"transport"|"other", error_record_dict)."""
    last = None
    for i in range(attempts):
        try:
            return "ok", fn()
        except Exception as e:  # noqa: BLE001 — classify + bound retries
            kind = classify(e)
            last = (kind, {
                "error": f"{type(e).__name__}: {e}"[:300],
                "error_kind": kind,
                "attempts": i + 1,
            })
            print(f"[retry {label}] attempt {i + 1}/{attempts}: {kind}: "
                  f"{str(e)[:160]}", flush=True)
            if kind != "transport":
                if kind == "device_oom":
                    last[1]["oom"] = True
                return last
            time.sleep(sleep_s * (1 + i))
    return last


def prewarm_subprocess(snippet: str, timeout_s: int = 1800, label: str = "",
                       attempts: int = 2) -> bool:
    """Run a compile-triggering python snippet in a child process with the
    persistent compile cache enabled, so the parent's real run hits the
    cache. Returns True when the child exited 0. The snippet runs with
    cwd=/root/repo and sys.path including it."""
    pre = (
        "import sys; sys.path.insert(0, '.')\n"
        "from bench import _enable_compile_cache\n"
        "_enable_compile_cache()\n"
    )
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", pre + snippet],
                cwd="/root/repo", timeout=timeout_s,
                capture_output=True, text=True,
            )
            if r.returncode == 0:
                return True
            print(f"[prewarm {label}] attempt {i + 1} rc={r.returncode}: "
                  f"{r.stdout[-200:]} {r.stderr[-300:]}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"[prewarm {label}] attempt {i + 1} timed out "
                  f"({timeout_s}s)", flush=True)
    return False


def merge_json(path: str, updates: dict) -> dict:
    """Read-modify-write a bench JSON: deep-merge ``updates`` into the
    existing file so a re-run that fixes one leg keeps the others."""
    try:
        with open(path) as fp:
            cur = json.load(fp)
    except (OSError, json.JSONDecodeError):
        cur = {}

    def deep(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep(dst[k], v)
            else:
                dst[k] = v

    deep(cur, updates)
    with open(path, "w") as fp:
        json.dump(cur, fp, indent=2)
    return cur
