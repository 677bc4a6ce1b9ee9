"""The driver-facing multi-chip dry run as a pytest: real dp+tp shardings
(min_size 1<<10 actually shards the big kernels over the 'model' axis) —
this is the coverage the tiny-geometry e2e mesh test cannot provide."""
import numpy as np
import pytest


@pytest.mark.e2e
def test_dryrun_multichip_8():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # asserts finite losses internally
