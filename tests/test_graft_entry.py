"""Driver contract: dryrun_multichip must compile+run the full training steps
and sharded search on the virtual 8-device mesh; entry() must be jittable."""
import sys

import pytest


def test_dryrun_multichip(eight_devices):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert float(loss) > 0
