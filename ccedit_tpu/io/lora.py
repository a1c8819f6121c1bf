"""Kohya-format LoRA merging into the flax param tree.

Behavioural parity target: convert_load_lora (scripts/sampling/util.py:115-272):
kohya names ('lora_unet_down_blocks_..._attn1_to_q.lora_down.weight' /
'lora_te_text_model_encoder_layers_...') are translated to module paths and
merged as ``W += strength * up @ down`` (conv 1x1 LoRAs squeezed).

Here we merge directly into the *flax* tree (post-conversion), translating
kohya names to our param paths:
  unet attn:  in_{level}_{nr}_attn/blocks_{d}/attn{1,2}/to_{q,k,v,out}
  unet ff:    .../blocks_{d}/ff/net_0/proj | net_2
  unet proj:  .../proj_in | proj_out
  text enc:   layers_{i}/self_attn/{q,k,v,out}_proj, layers_{i}/fc{1,2}

The kohya down/up-block indexing ('0-0'..'2-1' / '1-0'..'3-2', SD-1.5 layout,
util.py:174-193) is decoded to (level, block) positions.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

import flax

# kohya down_blocks index -> (level, nr) for SD-1.5 (2 res blocks/level)
_DOWN = {(0, 0): (0, 0), (0, 1): (0, 1), (1, 0): (1, 0), (1, 1): (1, 1),
         (2, 0): (2, 0), (2, 1): (2, 1)}
_UP = {(1, 0): (2, 0), (1, 1): (2, 1), (1, 2): (2, 2),
       (2, 0): (1, 0), (2, 1): (1, 1), (2, 2): (1, 2),
       (3, 0): (0, 0), (3, 1): (0, 1), (3, 2): (0, 2)}
# NOTE: kohya 'up_blocks' count from the top of the decoder; sgm output_blocks
# index 3..5 correspond to level 2 (mult 4), 6..8 level 1, 9..11 level 0
# (matching lora_sd_map_out in util.py:182-192 for channel_mult [1,2,4,4]).


def _unet_dst(key: str) -> Tuple[str, ...]:
    """kohya unet key (without prefix/suffix) -> our param path (tuple)."""
    parts = key.split("_")

    if key.startswith("mid_block"):
        # mid_block_attentions_0_<rest>
        rest = key[len("mid_block_attentions_0_"):]
        base = ("mid_attn",)
    else:
        m = re.match(r"(down|up)_blocks_(\d+)_attentions_(\d+)_(.*)", key)
        if not m:
            raise KeyError(key)
        direction, bi, ai, rest = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
        if direction == "down":
            level, nr = _DOWN[(bi, ai)]
            base = (f"in_{level}_{nr}_attn",)
        else:
            level, nr = _UP[(bi, ai)]
            base = (f"out_{level}_{nr}_attn",)

    if rest.startswith("proj_in"):
        return base + ("proj_in",)
    if rest.startswith("proj_out"):
        return base + ("proj_out",)
    m = re.match(r"transformer_blocks_(\d+)_(attn\d)_to_(q|k|v|out_0)", rest)
    if m:
        d, attn, dst = m.groups()
        dst = "to_out" if dst == "out_0" else f"to_{dst}"
        return base + (f"blocks_{d}", attn, dst)
    m = re.match(r"transformer_blocks_(\d+)_ff_net_(\d)(?:_proj)?", rest)
    if m:
        d, net = m.groups()
        return base + (f"blocks_{d}", "ff", "net_0/proj" if net == "0" else "net_2")
    raise KeyError(key)


def _te_dst(key: str) -> Tuple[str, ...]:
    m = re.match(r"text_model_encoder_layers_(\d+)_(.*)", key)
    if not m:
        raise KeyError(key)
    i, rest = m.group(1), m.group(2)
    if rest.startswith("self_attn"):
        proj = rest.split("_")[-2]  # q/k/v/out
        return (f"layers_{i}", "self_attn", f"{proj}_proj")
    m2 = re.match(r"mlp_fc(\d)", rest)
    if m2:
        return (f"layers_{i}", f"fc{m2.group(1)}")
    raise KeyError(key)


def merge_kohya_lora(
    params: Dict,
    lora_sd: Dict[str, np.ndarray],
    strength: float = 0.8,
) -> Dict:
    """Merge a kohya LoRA state dict into a converted engine param tree
    ({"network": {"unet": ...}, "conditioner": {"embedder_0": ...}})."""
    flat = flax.traverse_util.flatten_dict(params)
    n_merged, skipped = 0, []

    for key in list(lora_sd):
        if not key.endswith(".lora_down.weight"):
            continue
        up_key = key.replace("lora_down", "lora_up")
        alpha_key = key.split(".")[0] + ".alpha"
        down = np.asarray(lora_sd[key], dtype=np.float32)
        up = np.asarray(lora_sd[up_key], dtype=np.float32)
        if down.ndim == 4:
            down = down.squeeze(-1).squeeze(-1)
            up = up.squeeze(-1).squeeze(-1)
        rank = down.shape[0]
        alpha = float(np.asarray(lora_sd.get(alpha_key, rank)))
        scale = strength * alpha / rank

        name = key.split(".")[0]
        try:
            if name.startswith("lora_unet_"):
                path = ("network", "unet") + _unet_dst(name[len("lora_unet_"):])
            elif name.startswith("lora_te_"):
                path = ("conditioner", "embedder_0") + _te_dst(name[len("lora_te_"):])
            else:
                skipped.append(name)
                continue
        except KeyError:
            skipped.append(name)
            continue

        # expand any composite path parts ('net_0/proj')
        full: Tuple[str, ...] = ()
        for p in path:
            full += tuple(p.split("/"))
        full += ("kernel",)
        if full not in flat:
            skipped.append(name)
            continue
        delta = (up @ down) * scale  # (out, in) torch layout
        w = flat[full]
        if w.ndim == 2:  # dense kernel (in, out)
            flat[full] = w + np.asarray(delta.T, dtype=w.dtype)
        elif w.ndim == 4:  # 1x1 conv kernel (1,1,in,out)
            flat[full] = w + np.asarray(delta.T, dtype=w.dtype)[None, None]
        else:
            skipped.append(name)
            continue
        n_merged += 1

    print(f"[lora] merged {n_merged} pairs, skipped {len(skipped)}")
    if skipped[:5]:
        print("  e.g.", skipped[:5])
    return flax.traverse_util.unflatten_dict(flat)
