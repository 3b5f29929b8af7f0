"""End-to-end Gen-3 pipeline: raw image + article ids -> caption.

Capability parity target: TransformerFlattenedModel._forward
(/root/reference/ttl/tell/models/transformer_flattened.py:166-238):
ResNet-152 patches (49x2048) + RoBERTa article hiddens (optionally
25-layer weighted sum) -> contexts dict -> decoder.

Both encoders are frozen (reference `no_grad: ^resnet ^roberta`), so
`encode` runs under stop_gradient and can be jitted separately from
the train step (features can also be precomputed offline — the
fastest production path; see data/dataset.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.models.captioner import TransformerFlattened
from news_image_caption_tpu.models.resnet import (ResNetTrunk,
                                                  preprocess_image)
from news_image_caption_tpu.models.roberta import (RobertaEncoder,
                                                   WeightedSumFeatures)
from news_image_caption_tpu.utils.registry import MODELS


@MODELS.register("gen3_pipeline")
class Gen3Pipeline:
    """ResNet + RoBERTa encoders feeding the flagship captioner."""

    # requires_grad=False analog of the reference's `no_grad: ^resnet
    # ^roberta` (config.yaml:149-151): these variable collections get
    # zero gradients (stop_gradient in encode) AND are excluded from
    # the optimizer via optax.masked (training/optim.py::mask_frozen)
    # — no Adam moments allocated for the 415M frozen encoder params
    # and, critically, no decoupled weight decay silently shrinking
    # frozen weights every step.
    frozen_collections = ("resnet", "roberta")

    def __init__(self,
                 captioner: Optional[TransformerFlattened] = None,
                 resnet: Optional[ResNetTrunk] = None,
                 roberta: Optional[RobertaEncoder] = None,
                 weigh_bert: bool = False,
                 **decoder_kwargs):
        # YAML configs pass encoder kwargs as dicts
        # (resnet: {depth: 152, num_stages: 4}).
        if isinstance(resnet, dict):
            resnet = ResNetTrunk(**resnet)
        self.roberta_pipe = None
        if isinstance(roberta, dict):
            roberta = dict(roberta)
            # `ring: {data: D, context: C}` in YAML turns on ring
            # attention (parallel/ring.py) over a context mesh axis —
            # sequence-parallel encoding for long-article variants.
            ring = roberta.pop("ring", None)
            if ring:
                from news_image_caption_tpu.parallel.mesh import (
                    MeshConfig, make_mesh)
                roberta["ring_mesh"] = make_mesh(MeshConfig(**ring))
            # `pipe: {data: D, pipe: P, n_micro: M}` runs the encoder
            # through the GPipe schedule (parallel/pipe.py): layers
            # sharded over the `pipe` axis, microbatches over `data`.
            pipe = roberta.pop("pipe", None)
            if pipe:
                from news_image_caption_tpu.parallel.mesh import (
                    MeshConfig, make_mesh)
                pipe = dict(pipe)
                n_micro = pipe.pop("n_micro", None)
                if weigh_bert:
                    raise ValueError(
                        "roberta.pipe is incompatible with weigh_bert: "
                        "the pipelined encoder produces only the last "
                        "hidden (RobertaEncoder.encode_pipelined)")
                self.roberta_pipe = (make_mesh(MeshConfig(**pipe)),
                                     n_micro)
            roberta = RobertaEncoder(**roberta)
        self.captioner = captioner or TransformerFlattened(
            **decoder_kwargs)
        self.resnet = resnet or ResNetTrunk(depth=152, num_stages=4)
        self.roberta = roberta or RobertaEncoder()
        self.weigh_bert = weigh_bert
        self.weighted_sum = WeightedSumFeatures(
            num_layers=(self.roberta.num_layers + 1)) if weigh_bert \
            else None
        self.article_pad = self.roberta.padding_idx

    def init(self, rng, batch):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        variables = {
            "resnet": self.resnet.init(r1, batch["image"]),
            "roberta": self.roberta.init(r2, batch["article_ids"]),
        }
        if self.weigh_bert:
            # weighted-sum params initialized on the hiddens (one
            # RoBERTa pass; encode() below reuses the finished tree)
            _, hiddens = self.roberta.apply(variables["roberta"],
                                            batch["article_ids"])
            variables["weighted_sum"] = self.weighted_sum.init(
                r4, hiddens)
        ctx = self.encode(variables, batch)
        dec_batch = {**ctx, "caption_ids": batch["caption_ids"]}
        variables["captioner"] = self.captioner.init(r3, dec_batch)
        return variables

    def encode(self, variables, batch) -> Dict[str, jax.Array]:
        """Frozen encoders -> contexts dict (stop-gradient)."""
        image = batch["image"]
        if jnp.issubdtype(image.dtype, jnp.integer):
            # Raw uint8 HWC frames (SyntheticNewsDataset raw-image
            # mode / live serving): apply the reference's
            # normalize+crop (prepro_images, misc/utils.py:114-129)
            # before the trunk — the frozen-BN ported weights assume
            # ImageNet-normalized floats, and the offline path
            # (data/materialize.py) normalizes identically.
            image = preprocess_image(image)
        # Computation follows storage: ResNetTrunk's convs have no
        # explicit dtype (result follows operand promotion), so with
        # bf16-stored encoder params (O2 training / bf16 serving) a
        # fp32 normalized image would promote every conv back to fp32
        # — the trunk is the FLOPs-heaviest block of the online path.
        # Frozen-BN ResNet inference in bf16 is the standard recipe
        # (BASELINE.md resnet_bench row); fp32 params make this a
        # no-op.
        res_dtype = jax.tree.leaves(variables["resnet"])[0].dtype
        if jnp.issubdtype(image.dtype, jnp.floating):
            image = image.astype(res_dtype)
        patches = self.resnet.apply(variables["resnet"], image,
                                    method=ResNetTrunk.patches)
        if self.roberta_pipe is not None:
            mesh, n_micro = self.roberta_pipe
            last = self.roberta.encode_pipelined(
                variables["roberta"], batch["article_ids"], mesh,
                n_micro)
            hiddens = None   # weigh_bert rejected at __init__
        else:
            last, hiddens = self.roberta.apply(variables["roberta"],
                                               batch["article_ids"])
        if self.weigh_bert:
            if "weighted_sum" not in variables:
                # Config says 25-layer weighted sum but the variable
                # tree lacks it (checkpoint trained without it?) —
                # falling back to last-layer features would silently
                # run a different model.
                raise KeyError(
                    "weigh_bert=True but variables have no "
                    "'weighted_sum' collection")
            # stop_gradient on the HIDDENS, not the weighted sum:
            # bert_weight is a trainable model param in the reference
            # (transformer_flattened.py:208-218; only ^resnet ^roberta
            # are no_grad, config.yaml:149-151), so gradients must
            # reach it through the softmax-weighted combination while
            # the frozen encoder activations contribute none.
            hiddens = jax.lax.stop_gradient(hiddens)
            article = self.weighted_sum.apply(variables["weighted_sum"],
                                              hiddens)
        else:
            article = jax.lax.stop_gradient(last)
        B, P, _ = patches.shape
        return {
            "image": jax.lax.stop_gradient(patches),
            "image_mask": jnp.zeros((B, P), bool),
            "article": article,
            "article_mask": batch["article_ids"] == self.article_pad,
        }

    def loss_fn(self, variables, batch, dropout_rng=None):
        ctx = self.encode(variables, batch)
        dec_batch = {**ctx, "caption_ids": batch["caption_ids"]}
        return self.captioner.loss_fn(variables["captioner"], dec_batch,
                                      dropout_rng)

    def generate(self, variables, batch,
                 config: GenerationConfig = GenerationConfig(),
                 rng=None):
        ctx = self.encode(variables, batch)
        return self.captioner.generate(variables["captioner"], ctx,
                                       config, rng)

    def generate_beam(self, variables, batch,
                      config: GenerationConfig = GenerationConfig()):
        ctx = self.encode(variables, batch)
        return self.captioner.generate_beam(variables["captioner"], ctx,
                                            config)
