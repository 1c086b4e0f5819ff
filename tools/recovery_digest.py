#!/usr/bin/env python
"""Digest the round-4 chip recovery queue's logs into one summary.

The tunnel-recovery watcher (/tmp/tpu_watch6.sh) runs bench ->
message-path profile -> attention A/B -> combined soak -> serving
load test -> chunk32 A/B, each logging to /tmp. This prints the
headline numbers from whichever logs exist so the post-recovery doc
update is one read, not six.

Usage: python tools/recovery_digest.py
"""

import json
import re
from pathlib import Path

LOGS = {
    "bench": "/tmp/bench_r4_auto.log",
    "msgpath": "/tmp/msgpath_r4.log",
    "ab_attn": "/tmp/ab_attn_r4.log",
    "soak": "/tmp/soak_msg_r4.log",
    "load": "/tmp/load_r4.log",
    "ab_chunk32": "/tmp/ab_chunk32_r4.log",
}


def tail_matching(path, patterns, n=12):
    try:
        lines = Path(path).read_text(errors="replace").splitlines()
    except OSError:
        return None
    keep = [ln for ln in lines
            if any(re.search(p, ln) for p in patterns)]
    return keep[-n:] if keep else lines[-4:]


def main():
    for name, path in LOGS.items():
        print(f"== {name} ({path})")
        if not Path(path).exists():
            print("   (missing)")
            continue
        if name == "bench":
            out = tail_matching(path, [r'^\{"metric"', "FATAL", "rc="])
            for ln in out or []:
                if ln.startswith('{"metric"'):
                    d = json.loads(ln)
                    print(f"   e2e_rtfx {d.get('e2e_rtfx')} "
                          f"(p50 {d.get('e2e_rtfx_p50')}), "
                          f"files/hour {d.get('files_per_hour')} "
                          f"(p50 {d.get('files_per_hour_p50')}), "
                          f"encoder {d.get('encoder_rtfx')}")
                else:
                    print("  ", ln[:120])
        elif name == "msgpath":
            for ln in tail_matching(path, ["rtfx", "vad", "asr",
                                           "total", "segments"]) or []:
                print("  ", ln[:120])
        elif name in ("ab_attn", "ab_chunk32"):
            for ln in tail_matching(path, ["best", "med", "p50",
                                           "RTFx", "FAILED"]) or []:
                print("  ", ln[:120])
        else:
            for ln in tail_matching(path, ["OK", "RTFx", "rss", "RSS",
                                           "p50", "p95", "message",
                                           "chunks", "streaming"]) or []:
                print("  ", ln[:120])
    watch = Path("/tmp/tpu_watch6.log")
    if watch.exists():
        print("== watcher rc lines")
        for ln in watch.read_text().splitlines():
            if "rc=" in ln or "RUNNING" in ln:
                print("  ", ln)


if __name__ == "__main__":
    main()
