"""Multi-seed calibration of tests/test_planted_noise.py::run_experiment in the
EXACT suite environment (CPU + 8 virtual devices, forced BEFORE jax backend
init — the committed test's thresholds must hold in this environment).

The committed test asserts only causal facts that hold across every measured
seed and environment (see the seed table in README.md); this harness is how
those margins were measured and how to extend the table (one seed ~15 min on
the 1-core host):

    python experiments/ntm_identification/calibrate.py 0 1 2 3

Prints one JSON line per seed (the README table rows).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)
cache = os.path.join(_REPO, ".jax_cache", "cpu")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib  # noqa: E402
import tempfile  # noqa: E402

sys.path.insert(0, os.path.join(_REPO, "tests"))
import test_planted_noise as tpn  # noqa: E402


def main() -> None:
    seeds = [int(a) for a in sys.argv[1:]] or [0]
    for seed in seeds:
        with tempfile.TemporaryDirectory() as d:
            r = tpn.run_experiment(pathlib.Path(d), seed=seed)
        out = {
            "seed": seed,
            "miou_ce": round(float(r["miou_ce"]), 4),
            "miou_ce_val": round(float(r["miou_ce_val"]), 4),
        }
        for arm in ("verbatim", "paper", "oracle"):
            a = dict(r[arm])
            a.pop("t1", None)
            out[arm] = {k: round(float(v), 4) for k, v in a.items()}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
