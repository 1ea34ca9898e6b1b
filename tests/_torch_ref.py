"""Load the PyTorch reference's pure-torch modules for golden-value tests.

The reference package's __init__ chain pulls in lightning (not installed),
so we materialize only the dependency-light module files
(layers/dynamic_conv/distributions/model/loss modules) under a synthetic
package. Reference code is executed, never copied, to produce parity
fixtures — the strategy recommended in SURVEY.md §4.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference/eo_vae/models"

_PKG = "eoref"


def _load(mod_name: str, path: str, package: str | None = None):
    """spec_from_file_location → exec under the synthetic package (the one
    shared loading dance — ``package`` makes `from .x import ...` resolve)."""
    spec = importlib.util.spec_from_file_location(mod_name, path)
    mod = importlib.util.module_from_spec(spec)
    if package is not None:
        mod.__package__ = package
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_submodule(stem: str):
    """Load REF/modules/{stem}.py as eoref.modules.{stem} (idempotent) and
    alias it on the package module for relative imports."""
    name = f"{_PKG}.modules.{stem}"
    if name not in sys.modules:
        mod = _load(name, f"{REF}/modules/{stem}.py",
                    package=f"{_PKG}.modules")
        setattr(sys.modules[f"{_PKG}.modules"], stem, mod)
    return sys.modules[name]


def _ensure_pkg():
    if _PKG in sys.modules:
        return
    for name in (_PKG, f"{_PKG}.modules"):
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules[name] = mod

    for stem in ("layers", "dynamic_conv", "distributions"):
        _load_submodule(stem)
    # model.py does `from .modules.dynamic_conv import ...` relative to its
    # package — emulate by loading it with the synthetic package root.
    _load(f"{_PKG}.model", f"{REF}/model.py", package=_PKG)


def torch_modules():
    """Return (layers, dynamic_conv, distributions, model) reference modules."""
    _ensure_pkg()
    return (
        sys.modules[f"{_PKG}.modules.layers"],
        sys.modules[f"{_PKG}.modules.dynamic_conv"],
        sys.modules[f"{_PKG}.modules.distributions"],
        sys.modules[f"{_PKG}.model"],
    )


def torch_consistency_loss_module():
    """Load the reference consistency_loss.py (EOPatchLoss, DynamicPatchGAN,
    CharbonnierLoss, ...) for composed-step goldens.

    torchmetrics is not installed in this image; its only use in the module
    is SSIMLoss's MS-SSIM metric (consistency_loss.py:24-37), which golden
    tests run with ssim_weight=0 (MS-SSIM parity is pinned separately in
    tests/test_losses.py against our own torch-faithful implementation).
    The stub returns a 1.0 score so SSIMLoss yields exactly 0.0 — matching
    the jax side's `ssim = 0.0 if ssim_weight == 0` short-circuit."""
    _ensure_pkg()
    name = f"{_PKG}.modules.consistency_loss"
    if name in sys.modules:
        return sys.modules[name]

    try:
        import torchmetrics.image  # noqa: F401
    except ImportError:
        import torch

        class _StubMSSSIM:
            def __init__(self, *a, **kw):
                pass

            def __call__(self, pred, target):
                return torch.tensor(1.0)

        tm = types.ModuleType("torchmetrics")
        tm_image = types.ModuleType("torchmetrics.image")
        tm_image.MultiScaleStructuralSimilarityIndexMeasure = _StubMSSSIM
        tm.image = tm_image
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.image"] = tm_image

    _load_submodule("ffl")  # consistency_loss: `from .ffl import ...`
    return _load_submodule("consistency_loss")


def torch_loss_functions_module():
    """Load the reference loss_functions.py (EOGenerativeLoss) +
    loss_utils.py (NLayerDiscriminator, hinge/vanilla objectives).

    loss_functions imports the `focal_frequency_loss` PIP package
    (loss_functions.py:8), absent from this image; the reference carries
    its own vendored copy of the same class (modules/ffl.py — SURVEY.md
    §Key-deps note), so the stub aliases the vendored implementation
    rather than skipping the FFL term."""
    _ensure_pkg()
    name = f"{_PKG}.modules.loss_functions"
    if name in sys.modules:
        return sys.modules[name], sys.modules[f"{_PKG}.modules.loss_utils"]

    _load_submodule("ffl")
    try:
        import focal_frequency_loss  # noqa: F401
    except ImportError:
        import torch

        _Vendored = sys.modules[f"{_PKG}.modules.ffl"].FocalFrequencyLoss

        class _PipSemanticsFFL(_Vendored):
            """The vendored copy's batch_matrix=False branch is BROKEN
            upstream (ffl.py:76 indexes the [B,P]-flattened max with 5
            indices — documented in tests/test_losses.py), while the pip
            package loss_functions.py actually imports reduces the
            spectrum max over the SPATIAL dims per [B,P,C]. Execute the
            vendored code with only that reduction fixed to the pip
            semantics (which eovax/losses/ffl.py implements)."""

            def loss_formulation(self, recon_freq, real_freq, matrix=None):
                if matrix is None and not self.batch_matrix:
                    tmp = (recon_freq - real_freq) ** 2
                    m = torch.sqrt(tmp[..., 0] + tmp[..., 1] + 1e-8) ** self.alpha
                    if self.log_matrix:
                        m = torch.log1p(m)
                    max_val = m.flatten(3).max(-1).values[..., None, None]
                    max_val = torch.where(
                        torch.isfinite(max_val) & (max_val > 0),
                        max_val, torch.ones_like(max_val),
                    )
                    w = (m / max_val).clamp(0.0, 1.0).detach()
                    freq_distance = tmp[..., 0] + tmp[..., 1]
                    return torch.mean(w * freq_distance)
                return super().loss_formulation(recon_freq, real_freq, matrix)

        stub = types.ModuleType("focal_frequency_loss")
        stub.FocalFrequencyLoss = _PipSemanticsFFL
        sys.modules["focal_frequency_loss"] = stub

    lu = _load_submodule("loss_utils")
    lf = _load_submodule("loss_functions")
    return lf, lu


def torch_state_dict_numpy(module) -> dict:
    import numpy as np

    return {k: v.detach().cpu().numpy().astype(np.float32) for k, v in module.state_dict().items()}
