"""Evidence freshness gate (VERDICT r4 Weak #4 / ask #7): committed
docs/evidence artifacts must not predate the sources they measure."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_evidence_artifacts_fresh():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import check_evidence_fresh

    try:
        problems = check_evidence_fresh.check()
    except subprocess.CalledProcessError:
        import pytest

        pytest.skip("git history unavailable")
    assert not problems, "stale evidence:\n" + "\n".join(problems)
