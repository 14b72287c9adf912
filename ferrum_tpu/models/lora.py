"""LoRA adapter loading + runtime application.

TPU-native analog of the reference's LoRA support
(crates/ferrum-quantization/src/lora.rs LoraLinearRef +
crates/ferrum-models/src/lora.rs runtime loading): PEFT-format adapters
(adapter_config.json + adapter_model.safetensors) wrap the target
linears as LoraLinearParams — y = base(x) + (alpha/r) * (x@A)@B — over
dense OR packed-int4 base weights, composing with every serving path.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.linear import LoraLinearParams
from ..types import ModelLoadError
from .configs import ModelConfig
from .llama_family import LayerParams, ModelParams

_TARGET_ATTRS = {
    "q_proj": "q", "k_proj": "k", "v_proj": "v", "o_proj": "o",
    "gate_proj": "gate", "up_proj": "up", "down_proj": "down",
}


def load_lora_adapter(adapter_dir: str) -> Tuple[Dict[str, Any], float]:
    """Returns ({(layer_idx, attr): (A [in,r], B [r,out])}, scale)."""
    cfg_path = os.path.join(adapter_dir, "adapter_config.json")
    if not os.path.exists(cfg_path):
        raise ModelLoadError(f"no adapter_config.json under {adapter_dir}")
    with open(cfg_path) as f:
        acfg = json.load(f)
    r = int(acfg.get("r", 8))
    alpha = float(acfg.get("lora_alpha", r))
    scale = alpha / r

    import glob
    files = glob.glob(os.path.join(adapter_dir, "adapter_model*.safetensors"))
    if not files:
        raise ModelLoadError(f"no adapter_model.safetensors in {adapter_dir}")
    from safetensors import safe_open

    raw: Dict[str, np.ndarray] = {}
    for fpath in files:
        with safe_open(fpath, framework="numpy") as f:
            for k in f.keys():
                raw[k] = f.get_tensor(k)

    pairs: Dict[Tuple[int, str], Dict[str, np.ndarray]] = {}
    for name, t in raw.items():
        # ...model.layers.{i}.self_attn.q_proj.lora_A.weight
        m = name.replace("base_model.model.", "")
        parts = m.split(".")
        try:
            li = int(parts[parts.index("layers") + 1])
        except (ValueError, IndexError):
            continue
        proj = next((p for p in parts if p in _TARGET_ATTRS), None)
        if proj is None:
            continue
        kind = "A" if "lora_A" in name else ("B" if "lora_B" in name else None)
        if kind is None:
            continue
        pairs.setdefault((li, _TARGET_ATTRS[proj]), {})[kind] = t

    out: Dict[Tuple[int, str], Tuple[np.ndarray, np.ndarray]] = {}
    for key, ab in pairs.items():
        if "A" in ab and "B" in ab:
            # PEFT stores lora_A [r, in] and lora_B [out, r]; we want
            # x@A with A [in, r] and B [r, out].
            out[key] = (ab["A"].T, ab["B"].T)
    if not out:
        raise ModelLoadError(f"adapter {adapter_dir} has no usable pairs")
    return out, scale


def apply_lora(params: ModelParams, adapter: Dict[Tuple[int, str], Tuple],
               scale: float, dtype=jnp.bfloat16) -> ModelParams:
    """Wrap targeted linears with LoraLinearParams (non-destructive)."""
    import dataclasses

    layers = []
    for li, lp in enumerate(params.layers):
        changes = {}
        for (ali, attr), (a, b) in adapter.items():
            if ali != li:
                continue
            base = getattr(lp, attr)
            if base is None:
                continue
            changes[attr] = LoraLinearParams(
                base=base,
                lora_a=jnp.asarray(a, dtype=dtype),
                lora_b=jnp.asarray(b, dtype=dtype),
                scale=scale)
        layers.append(dataclasses.replace(lp, **changes) if changes else lp)
    return ModelParams(embed=params.embed, layers=layers,
                       final_norm=params.final_norm, lm_head=params.lm_head)
