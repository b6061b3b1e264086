"""Driver entry points must stay functional: multichip dry run on the
virtual mesh, both inline (enough devices visible) and self-provisioned
(driver scenario: the calling process sees fewer devices than requested)."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def test_dryrun_multichip_8_inline():
    # conftest provisions 8 virtual CPU devices -> inline path.
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions():
    # Driver scenario: the invoking process does NOT have 8 devices (here:
    # plain CPU, 1 device, no xla_force_host_platform_device_count).
    # dryrun_multichip must re-exec itself onto a virtual mesh and pass.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    res = subprocess.run([sys.executable, "-c", code], cwd=str(REPO),
                         env=env, capture_output=True, text=True,
                         timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip ok" in res.stdout
