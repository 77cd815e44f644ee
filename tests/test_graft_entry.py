"""Regression guard for the driver entry points."""

import os
import subprocess
import sys


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_axon_parent_bootstraps_without_initializing_jax():
    """With the axon TPU env present, dryrun_multichip must decide to
    re-exec the CPU farm from the environment alone — initializing the
    axon backend in the parent hangs indefinitely when the TPU pool is
    unreachable (observed r3), wedging the driver gate. The child run is
    faked by stubbing subprocess.run; importing jax against the
    unroutable pool IP would hang past the 60 s timeout."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = "203.0.113.1"  # TEST-NET, unroutable
    env["JAX_PLATFORMS"] = "axon"
    env.pop("_OT_DRYRUN_CHILD", None)
    code = (
        "import sys, unittest.mock as m; sys.path.insert(0, '/root/repo')\n"
        "import __graft_entry__ as g\n"
        "r = type('R', (), {'returncode': 0})()\n"
        "with m.patch('subprocess.run', return_value=r) as p:\n"
        "    g.dryrun_multichip(8)\n"
        "assert p.called\n"
        # sitecustomize imports jax to register the axon plugin, so check
        # that no backend was ever *initialized* (init is what hangs)
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'parent initialized {xb._backends}'\n"
        "print('ENV_BOOTSTRAP_OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60, env=env)
    assert r.returncode == 0, r.stderr
    assert "ENV_BOOTSTRAP_OK" in r.stdout
