"""The driver contract: dryrun_multichip must run the full multi-chip story.

conftest already forces the 8-device virtual CPU mesh, so the dryrun body
(_dryrun_impl) runs in-process here; the public dryrun_multichip wrapper
(subprocess + forced CPU platform) is exercised too, because it is exactly
what the driver calls from an arbitrarily-polluted JAX process.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_dryrun_impl_inprocess():
    graft._dryrun_impl(8)


def test_dryrun_multichip_subprocess():
    graft.dryrun_multichip(4)


def test_entry_compiles():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 2
