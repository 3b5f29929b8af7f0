"""YAML config + JSON overrides + component builders.

Capability parity target: the reference's Gen-3 config system —
YAML -> Params with JSON `--overrides` merge and string-keyed
registries (/root/reference/ttl/tell/commands/train.py:50-77,
__main__.py:1-103). Gen-1/2 argparse flag drivers map onto the same
configs (opts.py:5-147 -> config dicts).
"""

from __future__ import annotations

import copy
import json
from typing import Any, Dict, Optional

import yaml

# Import for registration side effects.
import news_image_caption_tpu.models  # noqa: F401
import news_image_caption_tpu.data.dataset  # noqa: F401
from news_image_caption_tpu.utils.registry import (DATASETS, DECODERS,
                                                   MODELS)


def load_config(path: str, overrides: Optional[str] = None) -> Dict:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if overrides:
        cfg = merge_overrides(cfg, json.loads(overrides))
    return cfg


def merge_overrides(cfg: Dict, overrides: Dict) -> Dict:
    """Deep-merge `overrides` into `cfg` (dicts merge, scalars replace)."""
    out = copy.deepcopy(cfg)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(out, overrides)
    return out


def _dtypeize(key: str, value):
    """YAML dtype strings -> jnp dtypes for dtype-like config keys."""
    if key in ("dtype", "param_dtype") and isinstance(value, str):
        import jax.numpy as jnp
        table = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                 "float32": jnp.float32, "fp32": jnp.float32}
        dtype = table.get(value)
        if dtype is None:
            raise ValueError(
                f"unsupported dtype {value!r} for config key {key!r}; "
                f"accepted spellings: {sorted(table)}")
        return dtype
    return value


def build_model(cfg: Dict):
    """Construct a model from the `model:` config block.

    `model.decoder.dtype: bfloat16` sets the decoder COMPUTE dtype
    (embedder / head preferred_element_type, cache dtypes); params
    stay fp32. Pair with `trainer.mixed_precision: bf16` for apex-O2
    style training (see benchmarks/train_bench.py measurements).
    """
    mcfg = copy.deepcopy(cfg["model"])
    mtype = mcfg.pop("type")
    model_cls = MODELS.get(mtype)
    decoder_cfg = mcfg.pop("decoder", None)
    mcfg = {k: _dtypeize(k, v) for k, v in mcfg.items()}
    if decoder_cfg is not None:
        dtype_ = decoder_cfg.pop("type", "dynamic_conv_decoder_flattened")
        decoder_cls = DECODERS.get(dtype_)
        decoder = decoder_cls(**{k: _dtypeize(k, _tupleize(v))
                                 for k, v in decoder_cfg.items()})
        return model_cls(decoder=decoder, **mcfg)
    return model_cls(**mcfg)


def build_dataset(cfg: Dict, split: str = "train"):
    dcfg = copy.deepcopy(cfg.get("dataset", {"type": "synthetic_news"}))
    dtype_ = dcfg.pop("type")
    split_cfg = dcfg.pop(split, {})
    for other in ("train", "val", "test"):
        dcfg.pop(other, None)
    dcfg.update(split_cfg)
    return DATASETS.build(dtype_, **dcfg)


def build_optimizer(cfg: Dict, model=None):
    """Build the configured optimizer. Pass `model` so models that
    declare `frozen_collections` (Gen3Pipeline's frozen ResNet/RoBERTa
    — the reference's `no_grad: ^resnet ^roberta`) get those
    collections masked out of the optimizer (optim.mask_frozen): no
    weight decay on frozen params, no moments allocated. Every call
    site that later builds a TrainState template from this tx (train /
    port / evaluate-restore) must pass the same model, or the
    checkpointed opt_state schema will not match."""
    from news_image_caption_tpu.training import optim

    ocfg = copy.deepcopy(cfg.get("trainer", {}).get(
        "optimizer", {"type": "bert_adam"}))
    otype = ocfg.pop("type")
    if otype == "bert_adam":
        tx = optim.make_bert_adam(
            lr=ocfg.pop("lr", 1e-4),
            t_total=ocfg.pop("t_total", 437600),
            warmup=ocfg.pop("warmup", 0.05),
            b1=ocfg.pop("b1", 0.9), b2=ocfg.pop("b2", 0.98),
            eps=ocfg.pop("e", 1e-6),
            weight_decay=ocfg.pop("weight_decay", 1e-5),
            max_grad_norm=ocfg.pop("max_grad_norm", 0.1))
    elif otype == "noam":
        tx = optim.noam_adam(
            model_size=ocfg.pop("model_size", 512),
            factor=ocfg.pop("factor", 1.0),
            warmup=ocfg.pop("warmup", 30000))
    elif otype == "gen1_adam":
        tx = optim.gen1_adam(
            lr=ocfg.pop("lr", 5e-4),
            decay_start=ocfg.pop("decay_start", 0),
            decay_every=ocfg.pop("decay_every", 10000),
            decay_rate=ocfg.pop("decay_rate", 0.8),
            grad_clip_value=ocfg.pop("grad_clip", 5.0))
    else:
        raise KeyError(f"unknown optimizer type {otype!r}")
    if ocfg:
        # A misspelled hyperparameter (e.g. learning_rate for lr)
        # must not silently train at the default.
        raise ValueError(
            f"unknown {otype} optimizer config keys: "
            f"{sorted(ocfg)}")
    frozen = getattr(model, "frozen_collections", ())
    if frozen:
        tx = optim.mask_frozen(tx, frozen)
    return tx


def _tupleize(v: Any) -> Any:
    return tuple(v) if isinstance(v, list) else v
