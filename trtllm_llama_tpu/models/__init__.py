"""Model families.

`by_architecture` maps the ModelConfig.architecture tag (recorded in every
engine dir) to the module implementing the forward contract
(init_params / init_caches / forward_prefill / forward_decode), so the
runtimes and CLI pick the right family without per-model scripts (the
reference needs a separate examples/<model>/ tree per family).
"""


def by_architecture(name: str):
    name = (name or "llama").lower()
    if name == "llama":
        from . import llama
        return llama
    if name == "mixtral":
        from . import moe
        return moe
    if name in ("gpt", "gpt2"):
        from . import gpt
        return gpt
    if name in ("gptj", "gpt-j"):
        from .decoder import GPTJ
        return GPTJ
    if name in ("gptneox", "gpt-neox"):
        from .decoder import GPTNEOX
        return GPTNEOX
    if name == "bloom":
        from .decoder import BLOOM
        return BLOOM
    if name == "opt":
        from .decoder import OPT
        return OPT
    if name == "chatglm":
        from . import chatglm
        return chatglm
    if name == "falcon":
        from .decoder import FALCON
        return FALCON
    raise ValueError(f"unknown architecture {name!r}")
