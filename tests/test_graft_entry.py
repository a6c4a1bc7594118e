"""Driver hooks: dryrun_multichip must run on the virtual 8-device mesh."""

import jax
import pytest

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g
    g.dryrun_multichip(2)


def test_dryrun_multiprocess_2x2():
    # multi-HOST mode: 2 jax.distributed processes x 2 devices (gloo)
    import __graft_entry__ as g
    g.dryrun_multiprocess(2, 2)
