"""Export surfaces: hand trained SRL models to non-JAX consumers."""

__all__ = ["build_torch_encoder", "export_torch_encoder"]


def __getattr__(name):
    # lazy: `python -m srl_zoo_tpu.export.torch_export` must not import the
    # submodule at package-import time (runpy double-import warning)
    if name in __all__:
        from srl_zoo_tpu.export import torch_export
        return getattr(torch_export, name)
    raise AttributeError(name)
