"""Import the upstream reference (read-only, /root/reference) for numerical
parity tests, stubbing the third-party modules that are not installed here
(mlx.data, simple_parsing, dataclass_wizard, torchinfo).

This mirrors the reference's own test methodology (tests/test_unet_mlx.py:
run the same inputs through two frameworks, compare numerically).
"""
import sys
import types

REF_PATH = "/root/reference/ml-mdm-matryoshka"


def _stub(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real-looking spec: transformers (and others) probe
    # find_spec()/module.__spec__ and choke on spec-less fakes
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def install_stubs():
    # --- mlx.data ---------------------------------------------------------
    class _Dummy:  # placeholder for Buffer/Stream/CharTrie etc.
        def __init__(self, *a, **k):
            pass

    class _FakeMxArray:
        pass

    mlx = _stub("mlx")
    mlx.__path__ = []  # make it look like a package
    data = _stub("mlx.data", Buffer=_Dummy, Stream=_Dummy)
    data.__path__ = []
    core = _stub(
        "mlx.data.core", CharTrie=_Dummy, Tokenizer=_Dummy, AWSFileFetcher=_Dummy
    )
    # einops probes `import mlx.core as mx` when "mlx" is in sys.modules;
    # give it a harmless module whose array type never matches real tensors.
    mxcore = _stub("mlx.core", array=_FakeMxArray)
    mlx.data = data
    mlx.core = mxcore
    data.core = core

    # --- simple_parsing ---------------------------------------------------
    class _ArgumentParser:
        def __init__(self, *a, **k):
            raise NotImplementedError("stubbed simple_parsing")

    sp = _stub("simple_parsing", ArgumentParser=_ArgumentParser)
    wrappers = _stub("simple_parsing.wrappers")
    fw = _stub(
        "simple_parsing.wrappers.field_wrapper",
        ArgumentGenerationMode=types.SimpleNamespace(BOTH="both"),
    )
    sp.wrappers = wrappers
    wrappers.field_wrapper = fw

    # --- dataclass_wizard ---------------------------------------------------
    class YAMLWizard:
        pass

    _stub("dataclass_wizard", YAMLWizard=YAMLWizard)

    # --- torchinfo ----------------------------------------------------------
    _stub("torchinfo", summary=lambda *a, **k: None)

    # --- boto3 (s3_helpers) --------------------------------------------------
    b3 = _stub("boto3", client=lambda *a, **k: None)
    b3.__path__ = []
    _stub("boto3.session", Session=_Dummy)
    s3m = _stub("boto3.s3")
    s3m.__path__ = []
    _stub("boto3.s3.transfer", TransferConfig=_Dummy)
    _stub("botocore")

    # --- torchvision (diffusion.py save_image helper) -------------------------
    tv = _stub("torchvision")
    tv.__path__ = []
    _stub("torchvision.utils", save_image=lambda *a, **k: None)


def load_reference():
    """Add the reference repo to sys.path (idempotent) and return ml_mdm."""
    install_stubs()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import ml_mdm  # namespace package

    return ml_mdm
