"""Regression guard for the driver entry points."""

import sys


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
