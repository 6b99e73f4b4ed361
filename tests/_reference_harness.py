r"""Import harness for the actual torch reference at /root/reference.

Cross-implementation parity tests (test_reference_parity*.py) execute the
real reference code — ``Net.forward_online`` (net/sig_mp.py:114-274),
``RNN.forward`` (articulate/utils/torch/rnn.py:121-133),
``ParametricModel.forward_kinematics`` (articulate/model.py:209-241) and the
math layer — against this repo's JAX rebuild with identical (randomly
initialized, converted) weights. No licensed asset is needed: the repo's
deterministic ``synthetic_smpl_data()`` body is written out in the official
SMPL pickle format, which is all the reference loader reads
(articulate/model.py:29-40).

The reference's optional heavy deps (wandb, thop, pyrender, trimesh, smplx)
are absent in this environment and irrelevant to the compute paths under
test; minimal inert stubs are installed so module import succeeds.
"""

from __future__ import annotations

import os
import pickle
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

_ns = None  # memoized namespace


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    _stub_module("wandb", init=lambda *a, **k: None,
                 watch=lambda *a, **k: None, log=lambda *a, **k: None,
                 finish=lambda *a, **k: None)
    _stub_module("thop", clever_format=lambda x, fmt="%.2f": str(x))
    # renderer.py imports these at module top; only class bodies use them
    _stub_module("trimesh")
    _stub_module("pyrender")
    smplx = _stub_module("smplx")
    if not hasattr(smplx, "SMPL"):
        smplx.SMPL = object  # net/smplify/temporal_smplify.py type hints only
        _stub_module("smplx.SMPL")
    # articulate.utils.xsens imports xdc.py, which imports bleak at module
    # top (xdc.py:29); only class references are taken at import time
    _stub_module("bleak", BleakScanner=object, BleakClient=object)


def write_reference_smpl_pickle(path: str, data=None) -> str:
    r"""Write a synthetic body in the official SMPL pickle format the
    reference loader expects (articulate/model.py:29-40): scipy-sparse
    J_regressor, dense weights/posedirs/shapedirs/v_template/J, faces ``f``,
    and ``kintree_table`` whose row 0 is the parent array."""
    import scipy.sparse as sp

    from robustcap_tpu.smpl.model import synthetic_smpl_data

    if data is None:
        data = synthetic_smpl_data()
    parent = [0 if p is None else int(p) for p in data.parent]
    kintree = np.zeros((2, len(parent)), dtype=np.int64)
    kintree[0] = parent
    kintree[1] = np.arange(len(parent))
    payload = {
        "J_regressor": sp.csc_matrix(data.j_regressor.astype(np.float64)),
        "weights": data.skinning_weights.astype(np.float64),
        "posedirs": data.posedirs.astype(np.float64),
        "shapedirs": data.shapedirs.astype(np.float64),
        "v_template": data.v_template.astype(np.float64),
        "J": data.joints.astype(np.float64),
        "f": data.faces.astype(np.int64),
        "kintree_table": kintree,
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def load_reference(tmp_root: str = None):
    r"""Import the reference as real python modules and return a namespace:

    ``ref.art`` — the reference ``articulate`` package,
    ``ref.sig_mp`` — ``net.sig_mp`` (Net, get_bbox_scale, sync_mp3d),
    ``ref.config`` — the reference flat config module,
    ``ref.smpl_file`` — absolute path of the synthetic SMPL pickle,
    ``ref.smpl_data`` — the SmplData both sides were built from.

    The reference binds its body model at import time from the *relative*
    path ``models/SMPL_male.pkl`` (config.py:2, net/sig_mp.py:19), so import
    happens with cwd at a scratch root containing that file. Memoized:
    repeated calls return the same loaded namespace.
    """
    global _ns
    if _ns is not None:
        return _ns

    from robustcap_tpu.smpl.model import synthetic_smpl_data

    if tmp_root is None:
        tmp_root = os.path.join(os.path.dirname(__file__), ".ref_scratch")
    smpl_data = synthetic_smpl_data()
    smpl_file = os.path.join(tmp_root, "models", "SMPL_male.pkl")
    write_reference_smpl_pickle(smpl_file, smpl_data)

    _install_stubs()
    cwd = os.getcwd()
    sys.path.insert(0, REFERENCE_ROOT)
    os.chdir(tmp_root)
    try:
        import articulate as art  # noqa: F401
        import config as ref_config  # noqa: F401
        import net.sig_mp as ref_sig_mp  # noqa: F401
    finally:
        os.chdir(cwd)

    ns = types.SimpleNamespace(
        art=art, config=ref_config, sig_mp=ref_sig_mp,
        smpl_file=os.path.abspath(smpl_file), smpl_data=smpl_data,
    )
    _ns = ns
    return ns


def import_reference_module(name: str):
    r"""Import an additional top-level reference module (e.g. ``utils``,
    ``preprocess``) after :func:`load_reference` — with cwd at the scratch
    root so relative asset paths (models/SMPL_male.pkl) resolve."""
    import importlib

    ns = load_reference()
    scratch = os.path.dirname(os.path.dirname(ns.smpl_file))
    cwd = os.getcwd()
    os.chdir(scratch)
    try:
        return importlib.import_module(name)
    finally:
        os.chdir(cwd)


def extract_trainer_inner(trainer_name: str, inner_name: str,
                          extra_ns: dict = None):
    r"""Compile a dataset builder nested inside a reference trainer
    (net/sig_mp.py:301-839) and return it as a standalone callable/class.

    The reference defines its per-RNN feature engineering as functions and
    classes *inside* ``train_rnn{2,3,4,6,7,8}`` (e.g. ``AISTDataset`` at
    sig_mp.py:302, the rnn4 ``AMASSDataset`` class at :489), unreachable
    without launching a training run. This lifts the inner definition out of
    the real source with ``ast`` and executes it under the reference
    module's own globals (body_model, device, RNNDataset, art, ...), so
    parity tests run the genuine reference code, not a re-transcription.
    Sibling ``augment_fn`` definitions (free variables of some builders) are
    compiled into the same namespace.
    """
    import ast
    import inspect
    import textwrap

    ref = load_reference()
    src = textwrap.dedent(inspect.getsource(getattr(ref.sig_mp, trainer_name)))
    fn_def = ast.parse(src).body[0]
    glb = dict(vars(ref.sig_mp))
    glb.update(extra_ns or {})
    for node in fn_def.body:
        if (isinstance(node, (ast.FunctionDef, ast.ClassDef))
                and node.name in (inner_name, "augment_fn")):
            mod = ast.Module(body=[node], type_ignores=[])
            code = compile(ast.fix_missing_locations(mod),
                           f"<reference {trainer_name}.{node.name}>", "exec")
            exec(code, glb)
    if inner_name not in glb:
        raise KeyError(f"{inner_name} not found inside {trainer_name}")
    return glb[inner_name]


def reference_scratch_root() -> str:
    r"""The scratch cwd the reference was imported from (contains
    models/SMPL_male.pkl and any relative-path assets tests add)."""
    ns = load_reference()
    return os.path.dirname(os.path.dirname(ns.smpl_file))


def torch_state_dict_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def make_reference_net(seed: int = 0, **flags):
    r"""A randomly initialized reference ``Net`` in eval mode (dropout off)
    with instance-level flag overrides (the reference mutates class attrs,
    e.g. evaluate.py:254 ``net.use_flat_floor = False``)."""
    import torch

    ref = load_reference()
    torch.manual_seed(seed)
    net = ref.sig_mp.Net()
    net.eval()
    for k, v in flags.items():
        setattr(net, k, v)
    return net
