"""Standalone run of bench.py's two giant sub-benches (33.6M bf16, 67.1M
int8) with device memory stats, to validate the q_chunk OOM fix in isolation
before the full bench rerun (r05-run1: both hit RESOURCE_EXHAUSTED; the 33M
stage-3 rescore gather was unchunked = 2.7 GiB on top of 12.9 GiB).

Run: cd /root/repo && python tools/bigmem_probe.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def stats():
    import jax

    d = jax.devices()[0]
    try:
        s = d.memory_stats() or {}
        return {
            k: round(v / 2**30, 2)
            for k, v in s.items()
            if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
        }
    except Exception as e:  # stats may be unsupported through the tunnel
        return {"err": str(e)[:80]}


def main():
    import jax

    print("devices", jax.devices(), flush=True)
    print("STATS start", json.dumps(stats()), flush=True)
    for name, fn in (
        ("33m", bench._bench_mips_33m),
        ("67m_int8", bench._bench_mips_67m_int8),
    ):
        t0 = time.monotonic()
        try:
            out = fn()
            print(f"OK {name}", json.dumps(out),
                  f"wall={time.monotonic() - t0:.0f}s", flush=True)
        except Exception as e:
            print(f"ERR {name}", f"{type(e).__name__}: {e}"[:300], flush=True)
        print(f"STATS after_{name}", json.dumps(stats()), flush=True)


if __name__ == "__main__":
    main()
