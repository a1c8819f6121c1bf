"""Import the PyTorch reference (read-only, /root/reference) for parity tests.

The reference drags in a zoo of unavailable deps (xformers, deepspeed,
annotator repos, torchdata, ...).  We stub exactly enough for the *model
definition* modules to import; no reference behavior beyond module
construction and forward passes is used.  This gives the golden oracle the
reference itself never had: random-init torch nets -> convert weights ->
bit-compare outputs (SURVEY.md §4).
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REFERENCE_PATH = "/root/reference"

_INSTALLED = False


class _AutoStub(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return type(name, (), {})


class _AutoStubFinder(importlib.machinery.PathFinder):
    PREFIXES = ("src", "mediapipe", "torchvision", "cv2")

    @classmethod
    def find_spec(cls, fullname, path=None, target=None):
        if fullname.split(".")[0] in cls.PREFIXES:
            spec = importlib.machinery.ModuleSpec(fullname, cls)
            spec.submodule_search_locations = []
            return spec
        return None

    @classmethod
    def create_module(cls, spec):
        m = _AutoStub(spec.name)
        m.__path__ = []
        m.annotator_ckpts_path = "/tmp/annotator_ckpts"
        m.HWC3 = lambda x: x
        m.resize_image = lambda x, r: x
        m.nms = lambda *a, **k: None
        m.safe_step = lambda *a, **k: None
        m.get_config = lambda *a, **k: None
        return m

    @classmethod
    def exec_module(cls, module):
        pass


def _stub(name, attrs=()):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for a in attrs:
        setattr(m, a, type(a, (), {}))
    sys.modules[name] = m
    return m


def install_reference():
    """Make `import sgm` work against /root/reference. Returns the sgm pkg."""
    global _INSTALLED
    if _INSTALLED:
        import sgm

        return sgm
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    # materialize transformers' lazy modules BEFORE stubs poison find_spec
    from transformers import CLIPTextModel  # noqa: F401
    from transformers.generation import GenerationMixin  # noqa: F401

    _stub("omegaconf", ["ListConfig", "OmegaConf", "DictConfig"])
    _stub("omegaconf.listconfig", ["ListConfig"])
    # a real list subclass: CustomIdentityEncoder (modules.py:1032) asserts
    # `x.__class__ == omegaconf.listconfig.ListConfig` then iterates it
    if not issubclass(sys.modules["omegaconf"].ListConfig, list):
        sys.modules["omegaconf"].ListConfig = type("ListConfig", (list,), {})
    sys.modules["omegaconf.listconfig"].ListConfig = sys.modules["omegaconf"].ListConfig
    # the reference spells it `omegaconf.listconfig.ListConfig` (modules.py:1031)
    sys.modules["omegaconf"].listconfig = sys.modules["omegaconf.listconfig"]
    _stub("pytorch_lightning", ["LightningDataModule", "LightningModule", "Callback", "Trainer"])
    _stub("pytorch_lightning.utilities", [])
    _stub("pytorch_lightning.utilities.distributed", [])
    _stub("pytorch_lightning.utilities.rank_zero", [])
    sys.modules["pytorch_lightning.utilities.distributed"].rank_zero_only = lambda f: f
    sys.modules["pytorch_lightning.utilities.rank_zero"].rank_zero_only = lambda f: f
    for mod in [
        "torchdata", "torchdata.datapipes", "torchdata.datapipes.iter",
        "kornia", "open_clip", "loralib", "fairscale", "fairscale.nn",
        "taming", "taming.modules", "taming.modules.losses", "webdataset",
        "wandb", "decord", "av", "deepspeed", "xformers", "xformers.ops",
        "flash_attn", "triton",
    ]:
        _stub(mod)
    _stub("fairscale.nn.checkpoint", ["checkpoint_wrapper"])
    _stub("taming.modules.losses.lpips", ["LPIPS"])
    _stub("sdata", ["create_dataset", "create_dummy_dataset", "create_loader"])

    sys.meta_path.insert(0, _AutoStubFinder)
    sys.modules["torchdata"].datapipes = sys.modules["torchdata.datapipes"]
    sys.modules["torchdata.datapipes"].iter = sys.modules["torchdata.datapipes.iter"]
    sys.modules["torchdata.datapipes.iter"].IterDataPipe = type("IterDataPipe", (), {})
    import webdataset

    webdataset.DataPipeline = type("DataPipeline", (), {})

    import sgm  # noqa: F401

    _INSTALLED = True
    return sgm


def randomize_state_dict(model, seed: int = 0, scale: float = 0.05):
    """Fill every parameter with small random values (so zero-init layers
    become active and outputs are non-trivial for parity comparison)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g, dtype=v.dtype) * scale
    model.load_state_dict(sd)
    return model
