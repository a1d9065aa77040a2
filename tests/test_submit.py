"""The north rule's launch mode, actually exercised: spark-submit
--py-files on a multi-executor local-cluster (2 executor JVMs x 4 cores),
PYTHONPATH scrubbed so the package can ONLY arrive via the shipped zip.
The job inside runs the cell-keyed PIP join plus two Arrow-UDF queries
(hex7 encode, UTM forward) — executor-side Python unpickles the package
from the zip, exactly as on a production cluster."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_smoke():
    # SUBMIT_PAIR=0: launch-path check only — the timed N-vs-4N pair is a
    # settled-host benchmark (tools/submit_smoke.py run directly) and must
    # not be re-measured (nor its BENCH record clobbered) inside pytest
    env = dict(os.environ, SUBMIT_PAIR="0")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_smoke.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert '"ok": true' in proc.stdout
