"""Real-dependency certification runner.

This image ships none of the optional arms (tiktoken, torch,
sentence-transformers, transformers, pypdf, pdfminer.six, marker), so
the env-gated tests in tests/test_realdeps.py record as skips and the
hermetic twins carry the certification. Run THIS script once in any
environment that has some or all of the deps to turn "gated plumbing"
into a recorded certification:

    python tools/certify_realdeps.py          # writes REALDEPS_CERT.json

It probes which optional deps import, runs the full gated test file
(plus the s2s:/st:/hf: scoring arms in tests/test_scoring.py that key
off the same imports), and writes a JSON record — dep versions, test
ids, pass/skip/fail — suitable for committing next to the round
artifacts. Nothing here installs anything; absence is recorded, not
treated as failure.
"""

from __future__ import annotations

import importlib
import json
import platform
import subprocess
import sys

OPTIONAL_DEPS = [
    "tiktoken",
    "torch",
    "sentence_transformers",
    "transformers",
    "pypdf",
    "pdfminer",
    "marker",
]

GATED_TEST_TARGETS = [
    "tests/test_realdeps.py",
    # the scorer registry arms (st:/hf:/s2s:) gate on the same deps
    "tests/test_scoring.py",
]


def probe_deps() -> dict:
    out = {}
    for name in OPTIONAL_DEPS:
        try:
            mod = importlib.import_module(name)
            out[name] = getattr(mod, "__version__", "present")
        except Exception:
            out[name] = None
    return out


def main() -> int:
    deps = probe_deps()
    present = sorted(k for k, v in deps.items() if v)
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            *GATED_TEST_TARGETS,
            "-v",
            "--tb=short",
            "-rs",
        ],
        capture_output=True,
        text=True,
    )
    lines = proc.stdout.splitlines()
    results = [
        ln
        for ln in lines
        if " PASSED" in ln or " FAILED" in ln or " SKIPPED" in ln
    ]
    executed = [ln for ln in results if " PASSED" in ln]
    record = {
        "python": platform.python_version(),
        "platform": platform.platform(),
        "deps": deps,
        "deps_present": present,
        # Vendored real-weights arms (no optional dep required): the
        # sft: safetensors lane executes in ANY image, so the cert
        # always records at least one weights-from-disk forward pass
        # actually run — distinguish it from the import-gated arms.
        "vendored_weights": {
            "sft:mini-mlp": "finmapreduce_spark/resources/"
            "mini_mlp.safetensors",
        },
        "pytest_returncode": proc.returncode,
        "summary": lines[-1] if lines else "",
        "n_executed": len(executed),
        "n_skipped": len([ln for ln in results if " SKIPPED" in ln]),
        "tests": results,
    }
    with open("REALDEPS_CERT.json", "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({"deps_present": present, "rc": proc.returncode}))
    print("wrote REALDEPS_CERT.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
