"""Faithful PyTorch re-implementation of the reference pointer model.

Reproduces, with reference-identical state-dict keys and math, the
entity/copy heads of
/root/reference/ttl/tell/models/transformer_pointer.py:27-313 on top of
the reference-keyed TellDecoder (torch_tell_decoder.py):

- gated SelfAttention (self_attention.py:10-74 wrapping
  DownsampledMultiHeadAttention -> SingleHeadAttention,
  downsampled_single_head.py:12-229, project_input=False so the inner
  GatedLinear stacks are dead-but-serialized parameters);
- multi_head_attention_score_forward (multi_head.py:14-205) with fused
  (q, k) in_proj, bias_k slot and add_zero_attn;
- pointer_loss (transformer_pointer.py:181-313): entity CE with
  ignore_index -1, reduced-vocab scatter-add copy loss.

Purpose: a stand-in for a real pointer `best.th` so
`port_pointer_model` / `port_checkpoint` and the torch-vs-JAX parity
tests run without the upstream checkpoint. Keys match a real one.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_tell_decoder import GehringLinear, TellDecoder


def gated_linear(in_features, out_features, bias=True):
    """downsampled_single_head.py:233-249 — GLU-interspersed stack."""
    return nn.Sequential(
        GehringLinear(in_features, out_features * 4, bias=bias),
        nn.GLU(),
        GehringLinear(out_features * 2, out_features * 2, bias=bias),
        nn.GLU(),
        GehringLinear(out_features, out_features, bias=bias),
    )


class SingleHeadAttention(nn.Module):
    """downsampled_single_head.py:12-229 with project_input=False,
    gated=True, downsample=False (the pointer model's configuration).

    The gated in_proj stacks exist only as (dead) parameters; the live
    path splits pre-projected q/k/v into heads, applies strict causal
    masking (diagonal excluded), a scalar-bias slot, one softmax, and
    the out projection over the re-concatenated heads.
    """

    def __init__(self, out_channels, embed_dim, head_dim, num_heads):
        super().__init__()
        self.embed_dim = embed_dim
        self.head_dim = head_dim
        self.num_heads = num_heads
        self.scaling = head_dim ** -0.5
        out_proj_size = head_dim * num_heads
        # dead parameters (project_input=False), keys must still exist
        self.in_proj_q = gated_linear(embed_dim, out_proj_size)
        self.in_proj_k = nn.Sequential(
            gated_linear(embed_dim, out_proj_size))
        self.in_proj_v = nn.Sequential(
            gated_linear(embed_dim, out_proj_size))
        self.out_proj = GehringLinear(out_proj_size, out_channels)

    def forward(self, query, key, value, mask_future_timesteps=True,
                use_scalar_bias=True):
        """query/key/value [T, B, E] (already projected)."""
        src_len, bsz, _ = key.shape
        tgt_len = query.shape[0]
        size = bsz * self.num_heads
        q = (query * self.scaling).view(tgt_len, size, self.head_dim)
        k = key.view(src_len, size, self.head_dim)
        v = value.view(src_len, size, self.head_dim)
        q, k, v = (t.transpose(0, 1) for t in (q, k, v))
        attn_weights = torch.bmm(q, k.transpose(1, 2))
        if mask_future_timesteps:
            if tgt_len == src_len:
                attn_weights = self._mask_future_full(attn_weights)
            else:
                attn_weights = self._mask_future_partial(
                    attn_weights, src_len)
        if use_scalar_bias:
            # scalar_bias.py:10-31: zero column and zero value slot
            attn_weights = torch.cat(
                [attn_weights.new_zeros(size, tgt_len, 1), attn_weights],
                dim=2)
            v = torch.cat([v.new_zeros(size, 1, self.head_dim), v],
                          dim=1)
        attn_weights = F.softmax(attn_weights, dim=-1)
        attn = torch.bmm(attn_weights, v)
        attn = attn.transpose(0, 1).contiguous().view(
            tgt_len, bsz, self.embed_dim)
        return self.out_proj(attn), attn_weights

    def _mask_future_full(self, attn_weights):
        # strict causal: zero-out incl. diagonal, then add -inf there
        tgt_len = attn_weights.shape[1]
        mask = torch.tril(attn_weights.new_ones(tgt_len, tgt_len),
                          diagonal=-1)
        offset = torch.triu(
            attn_weights.new_full((tgt_len, tgt_len), -math.inf),
            diagonal=0)
        return attn_weights * mask.unsqueeze(0) + offset.unsqueeze(0)

    def _mask_future_partial(self, attn_weights, src_len):
        tgt_len = attn_weights.shape[1]
        mask = torch.tril(attn_weights.new_ones(tgt_len, src_len),
                          diagonal=src_len - tgt_len - 1)
        offset = torch.triu(
            attn_weights.new_full((tgt_len, src_len), -math.inf),
            diagonal=src_len - tgt_len)
        return attn_weights * mask.unsqueeze(0) + offset.unsqueeze(0)


class DownsampledMultiHeadAttention(nn.Module):
    """downsampled_multi_head.py:9-87, downsample=False branch only."""

    def __init__(self, out_channels, embed_dim, num_heads):
        super().__init__()
        self.attention_module = SingleHeadAttention(
            out_channels, embed_dim, embed_dim // num_heads, num_heads)

    def forward(self, query, key, value):
        attn, _ = self.attention_module(query, key, value)
        return attn


class SelfAttention(nn.Module):
    """self_attention.py:10-74 (gated=True, project_input=False)."""

    def __init__(self, out_channels=1024, embed_dim=1024, num_heads=16):
        super().__init__()
        self.attention = DownsampledMultiHeadAttention(
            out_channels, embed_dim, num_heads)
        self.in_proj_q = GehringLinear(out_channels, embed_dim)
        self.in_proj_k = GehringLinear(out_channels, embed_dim)
        self.in_proj_v = GehringLinear(out_channels, embed_dim)
        self.ln = nn.LayerNorm(out_channels)

    def forward(self, x):
        """x [T, B, C] -> [T, B, C]."""
        residual = x
        q = self.in_proj_q(x)
        k = self.in_proj_k(x)
        v = self.in_proj_v(x)
        out = self.attention(q, k, v)
        return self.ln(out + residual)


def multi_head_attention_score_forward(query, key, embed_dim, num_heads,
                                       in_proj_weight, in_proj_bias,
                                       bias_k, dropout_p,
                                       training=False,
                                       key_padding_mask=None):
    """multi_head.py:14-205 (qk distinct, add_zero_attn=True).

    query [L, N, E], key [S, N, E] -> head-averaged probs [N, L, S+2]
    (bias_k slot + zero-attn slot kept, as at the reference call site
    transformer_pointer.py:232-239 which drops them afterwards).
    """
    tgt_len, bsz, _ = query.shape
    head_dim = embed_dim // num_heads
    q = F.linear(query, in_proj_weight[:embed_dim],
                 in_proj_bias[:embed_dim]) * (head_dim ** -0.5)
    k = F.linear(key, in_proj_weight[embed_dim:],
                 in_proj_bias[embed_dim:])
    k = torch.cat([k, bias_k.repeat(1, bsz, 1)])
    if key_padding_mask is not None:
        key_padding_mask = torch.cat(
            [key_padding_mask,
             key_padding_mask.new_zeros(bsz, 1)], dim=1)
    q = q.contiguous().view(tgt_len, bsz * num_heads,
                            head_dim).transpose(0, 1)
    k = k.contiguous().view(-1, bsz * num_heads,
                            head_dim).transpose(0, 1)
    # add_zero_attn
    k = torch.cat([k, k.new_zeros(k.shape[0], 1, head_dim)], dim=1)
    if key_padding_mask is not None:
        key_padding_mask = torch.cat(
            [key_padding_mask,
             key_padding_mask.new_zeros(bsz, 1)], dim=1)
    src_len = k.shape[1]
    w = torch.bmm(q, k.transpose(1, 2))
    if key_padding_mask is not None:
        w = w.view(bsz, num_heads, tgt_len, src_len)
        w = w.masked_fill(
            key_padding_mask.unsqueeze(1).unsqueeze(2), float("-inf"))
        w = w.view(bsz * num_heads, tgt_len, src_len)
    w = F.softmax(w, dim=-1)
    w = F.dropout(w, p=dropout_p, training=training)
    return w.view(bsz, num_heads, tgt_len, src_len).sum(dim=1) / num_heads


class TellPointer(nn.Module):
    """Reference-keyed pointer model (transformer_pointer.py:27-313).

    Own keys (on top of `decoder.*`): entity_fc, in_proj_weight,
    in_proj_bias, out_proj, bias_k, entity_attn.*.
    """

    def __init__(self, embed_dim=1024, num_heads=16, vocab_size=50264,
                 **decoder_kwargs):
        super().__init__()
        self.decoder = TellDecoder(vocab_size=vocab_size,
                                   embed_dim=embed_dim,
                                   num_heads=num_heads, **decoder_kwargs)
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.vocab_size = vocab_size
        self.entity_fc = GehringLinear(embed_dim, 2)
        self.in_proj_weight = nn.Parameter(
            torch.empty(2 * embed_dim, embed_dim))
        self.in_proj_bias = nn.Parameter(torch.empty(2 * embed_dim))
        self.out_proj = GehringLinear(embed_dim, embed_dim, bias=True)
        self.bias_k = nn.Parameter(torch.empty(1, 1, embed_dim))
        nn.init.xavier_uniform_(self.in_proj_weight)
        nn.init.constant_(self.in_proj_bias, 0.0)
        nn.init.xavier_normal_(self.bias_k)
        self.entity_attn = SelfAttention(
            out_channels=embed_dim, embed_dim=embed_dim,
            num_heads=num_heads)
        self.entity_loss = nn.CrossEntropyLoss(ignore_index=-1)

    @torch.no_grad()
    def hidden(self, caption_ids, contexts):
        x = self.decoder.embedder(caption_ids)
        for layer in self.decoder.layers:
            x = layer(x, contexts)
        return x

    @torch.no_grad()
    def copy_scores(self, x, x_article, article_padding_mask=None):
        """x [B, L, E], x_article [B, S, E] -> probs [B, L, S]."""
        probs = multi_head_attention_score_forward(
            x.transpose(0, 1), x_article.transpose(0, 1),
            self.embed_dim, self.num_heads, self.in_proj_weight,
            self.in_proj_bias, self.bias_k, 0.1, training=False,
            key_padding_mask=article_padding_mask)
        return probs[:, :, :-2]

    @torch.no_grad()
    def pointer_loss(self, x, caption_copy_masks, context_proper_masks,
                     context_ids, caption_targets, x_article,
                     article_padding_mask=None):
        """transformer_pointer.py:181-313, batch-first. Returns
        (entity_loss, copy_loss), both already /log(2)."""
        copy_masks = caption_copy_masks[:, 1:]
        x_entity = self.entity_attn(x.transpose(0, 1)).transpose(0, 1)
        entity_logits = self.entity_fc(x_entity).view(-1, 2)
        targets = copy_masks.clone().reshape(-1)
        targets[targets > 1] = 1
        entity_loss = self.entity_loss(entity_logits, targets)

        copy_attn = self.copy_scores(x, x_article, article_padding_mask)
        copy_attn = copy_attn.clone()
        irrelevant = (context_proper_masks < 1).unsqueeze(1).expand_as(
            copy_attn)
        copy_attn[irrelevant] = 0
        B, L, S = copy_attn.shape

        unique_ids = torch.cat([context_ids, caption_targets],
                               dim=1).unique()
        V = len(unique_ids)
        inverse = unique_ids.new_full([self.vocab_size], -1)
        inverse.index_copy_(0, unique_ids, torch.arange(V))
        new_context_ids = inverse.index_select(
            0, context_ids.reshape(-1)).view(B, S)
        new_context_ids = new_context_ids.unsqueeze(1).expand_as(
            copy_attn)
        new_targets = inverse.index_select(
            0, caption_targets.reshape(-1)).reshape(-1, 1)

        copy_probs = copy_attn.new_zeros(B, L, V)
        copy_probs.scatter_add_(2, new_context_ids, copy_attn)
        copy_lprobs = copy_probs.new_zeros(copy_probs.shape)
        copy_lprobs[copy_probs > 0] = torch.log(
            copy_probs[copy_probs > 0])
        copy_lprobs = copy_lprobs.view(B * L, V)

        max_index = int(copy_masks.max().item())
        copy_loss = torch.tensor(0.0)
        for i in range(1, max_index + 1):
            rel = (copy_masks == i).view(-1)
            copy_loss = copy_loss + (
                -copy_lprobs[rel].gather(
                    dim=-1, index=new_targets[rel]).mean())
        return entity_loss / math.log(2), copy_loss / math.log(2)

    @torch.no_grad()
    def generate_greedy(self, B, contexts, x_article,
                        article_padding_mask, context_proper_masks,
                        context_ids, max_len=16, bos_id=0, eos_id=2,
                        pad_id=1):
        """Reference-style greedy pointer decode
        (transformer_pointer.py:427-670, sampling_topk=1, batch kept
        full; finished rows emit pad). Returns (tokens [B, max_len+1],
        copied_flags [B, max_len])."""
        dec = self.decoder
        bufs = [torch.zeros(B, k - 1, dec.embed_dim)
                for k in dec.kernel_sizes]
        tok = torch.full((B,), bos_id, dtype=torch.long)
        finished = torch.zeros(B, dtype=torch.bool)
        copied = torch.zeros(B, self.vocab_size, dtype=torch.bool)
        relevant = (context_proper_masks >= 1).float()
        out, flags = [tok], []
        xs = []
        for i in range(max_len):
            x = dec.embedder(tok.unsqueeze(1), start_pos=i)[:, 0]
            for li, layer in enumerate(dec.layers):
                x, bufs[li] = layer.step(x, contexts, bufs[li])
            lp = dec.adaptive_softmax.get_log_prob(x)
            xs.append(x)
            x_full = torch.stack(xs, dim=1)
            # reference recomputes full entity self-attention per step
            x_entity = self.entity_attn(
                x_full.transpose(0, 1)).transpose(0, 1)
            entity_logits = self.entity_fc(x_entity[:, -1])
            should_copy = entity_logits.argmax(dim=-1) == 1
            attn = self.copy_scores(
                x.unsqueeze(1), x_article, article_padding_mask)[:, 0]
            attn = attn * relevant
            dist = attn.new_zeros(B, self.vocab_size)
            dist.scatter_add_(1, context_ids, attn)
            copy_p, copy_tok = dist.max(dim=-1)
            has_copied = copied.gather(
                1, copy_tok.unsqueeze(1)).squeeze(1)
            should_copy = (should_copy & (copy_p >= 1e-6)
                           & ~has_copied)
            gen_tok = lp.argmax(-1)
            tok = torch.where(should_copy, copy_tok, gen_tok)
            tok = torch.where(finished, torch.full_like(tok, pad_id),
                              tok)
            row = torch.arange(B)
            copied[row, copy_tok] |= should_copy
            finished = finished | (tok == eos_id)
            out.append(tok)
            flags.append(should_copy & ~finished)
        return (torch.stack(out, dim=1),
                torch.stack(flags, dim=1))
