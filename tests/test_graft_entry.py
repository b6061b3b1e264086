"""Driver entry points must stay functional: multichip dry run on the
virtual mesh."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
