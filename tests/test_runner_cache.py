"""Device-residency cache contracts (gaitlab.pipeline.runner).

The Orbax/weight-import path hands the runner HOST numpy variable trees;
CLAUDE.md mandates a single device_put with reuse, because re-uploading
~250 MB through the tunneled H2D link per dispatch costs seconds. These
tests pin the cache semantics: same variables object -> same device tree
(no re-upload); reassigned variables -> refreshed device tree.
"""

import jax
import numpy as np

from gaitlab.nn.grnet import GRNet
from gaitlab.pipeline.runner import GRNetRunner


def test_trunk_variables_cached_across_calls():
    model = GRNet.create()
    runner = GRNetRunner(model)
    a = runner._trunk_variables()
    b = runner._trunk_variables()
    assert a is b, "second call must reuse the device-resident tree"


def test_trunk_variables_refresh_on_reassign():
    model = GRNet.create()
    runner = GRNetRunner(model)
    a = runner._trunk_variables()
    # weight reload through the api rebinds model.variables to a new tree
    model.variables = jax.tree_util.tree_map(np.asarray, model.variables)
    b = runner._trunk_variables()
    assert a is not b, "reassigned variables must invalidate the cache"
    c = runner._trunk_variables()
    assert b is c, "…and the refreshed tree must then be reused"


def test_device_put_called_once(monkeypatch):
    """Counts actual uploads: two forwards, one device_put of the trunk."""
    model = GRNet.create()
    runner = GRNetRunner(model)
    calls = {"n": 0}
    orig = runner._device_tree

    def counting(tree):
        calls["n"] += 1
        return orig(tree)

    monkeypatch.setattr(runner, "_device_tree", counting)
    runner._trunk_variables()
    runner._trunk_variables()
    runner._smpl_params()
    runner._smpl_params()
    assert calls["n"] == 2  # one for variables, one for SMPL
