#!/usr/bin/env python
"""Re-seed the tuner's on-disk cache with the round-verified headline
winner after a VM rotation wiped ~/.voltrix_spmm_tpu.

The entry written here is exactly what tuner.SpmmTuner persisted after
the round-4/5 headline races: three independent COLD races agreed
within 1.2% (6.29 / 6.22 / 6.23 ms) and the round-5 re-verify measured
19.081x (bench/headline_r5_verify.json). Rotations wipe the cache dir;
without this seed the driver's end-of-round bench.py pays a full
12-candidate cold race against the relay's availability window.

The signature is rebuilt through the SAME code paths bench.py uses
(bench.headline_space for the space hash, tuner._code_version for the
code hash), so any source drift since the races invalidates the seed
naturally — a mismatched signature is simply never disk-hit and
bench.py races cold as before. bench.py still MEASURES the winner
fresh on-device on every run; only the race is skipped.
"""

import dataclasses
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import headline_space  # noqa: E402
from voltrix_spmm_tpu.tuner import Variant  # noqa: E402
from voltrix_spmm_tpu.tuner import tuner as _tuner  # noqa: E402

# Winner of the round-4/5 headline races (headline_r5_verify.json):
# deep-unroll u8 subtile pregather with bf16 gathered storage.
WINNER = Variant(
    "pregather",
    block_h=2048,
    block_unroll=8,
    subtile=True,
    feat_dtype="bfloat16",
)
WINNER_KEY = "pregather/h2048w128s1u8st/xbfloat16/dNone/float32/None/tNone"
TIME_MS = 6.2443  # measured, headline_r5_verify.json detail.pallas_ms


def main() -> int:
    space = headline_space(256)
    assert WINNER.key() == WINNER_KEY, WINNER.key()
    assert any(v.key() == WINNER_KEY for v in space), "winner not in space"

    smd5 = hashlib.md5(
        "|".join(sorted(v.key() for v in space)).encode()
    ).hexdigest()[:8]
    # bench.py identity: hash_tag=f"bench-rmat{17}-deg{16}-rcm",
    # n=131072 (symmetrize+RCM preserve the node count), d=256, f32.
    signature = f"bench-rmat17-deg16-rcm.n131072.d256.float32.s{smd5}.{_tuner._code_version()}"

    cache = _tuner.SpmmTuner()
    path = cache._disk_path(signature)
    if os.path.exists(path):
        print(f"seed: already present: {path}")
        return 0
    os.makedirs(os.path.dirname(path), exist_ok=True)
    entry = {
        "variant": dataclasses.asdict(WINNER),
        "ordering": "identity",
        "time_ms": TIME_MS,
        "candidates": {WINNER_KEY: TIME_MS},
        "seeded": "bench/seed_headline_cache.py (post-rotation recovery)",
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, path)
    print(f"seed: wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
