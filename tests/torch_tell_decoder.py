"""Faithful PyTorch re-implementation of the reference Tell decoder.

Reproduces, with reference-identical state-dict keys and math, the
`dynamic_conv_decoder_flattened` decoder of
/root/reference/ttl/tell/models/decoder_flattened.py:22-359 and its
modules (AdaptiveEmbedding adaptive.py:11-80, AdaptiveSoftmax +
TiedHeadModule softmax.py:11-222, GehringLinear linear.py:8-50,
fairseq MultiHeadAttention multi_head.py:207-552, DynamicConv1dTBC
dynamic.py:25-361, SinusoidalPositionalEmbedding positional.py:85-268).

Purpose: a stand-in for a real `best.th` so `port_tell_decoder` and
the full-model torch-vs-JAX parity tests can run without the upstream
checkpoint (AllenNLP/fairseq are not installed here). When a real
checkpoint appears, its `decoder.*` keys match this module's keys.

Everything runs batch-first internally; the reference's TBC layout is
a GPU-kernel artifact with identical math.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def make_positions(x: torch.Tensor, padding_idx: int,
                   start_pos: int = 0) -> torch.Tensor:
    """Index-based positions (positional.py:255-268): non-pad column t
    gets padding_idx + 1 + t (+ start offset); pads keep padding_idx."""
    mask = x.ne(padding_idx)
    T = x.shape[1]
    positions = torch.arange(T).unsqueeze(0) + padding_idx + 1 + start_pos
    return torch.where(mask, positions.expand_as(x),
                       torch.full_like(x, padding_idx))


def sinusoidal_table(n_embeds: int, embed_dim: int,
                     padding_idx: int) -> torch.Tensor:
    """tensor2tensor layout (positional.py:126-166): all sin, then cos."""
    max_ts, min_ts = 10000.0, 1.0
    n_timescales = embed_dim // 2
    increment = math.log(max_ts / min_ts) / (n_timescales - 1)
    inv_timescales = min_ts * torch.exp(
        torch.arange(n_timescales, dtype=torch.float) * -increment)
    positions = torch.arange(n_embeds, dtype=torch.float).unsqueeze(1)
    scaled = positions * inv_timescales.unsqueeze(0)
    signal = torch.cat([torch.sin(scaled), torch.cos(scaled)], dim=1)
    if embed_dim % 2 == 1:
        signal = torch.cat([signal, torch.zeros(n_embeds, 1)], dim=1)
    signal[padding_idx, :] = 0
    return signal


class SinusoidalPositionalEmbedding(nn.Module):
    def __init__(self, embedding_dim: int, padding_idx: int,
                 init_size: int = 512):
        super().__init__()
        self.embedding_dim = embedding_dim
        self.padding_idx = padding_idx
        self.register_buffer(
            "weights", sinusoidal_table(init_size + padding_idx + 2,
                                        embedding_dim, padding_idx))

    def forward(self, x: torch.Tensor, start_pos: int = 0) -> torch.Tensor:
        positions = make_positions(x, self.padding_idx, start_pos)
        return self.weights.index_select(
            0, positions.reshape(-1)).view(*x.shape, -1).detach()


class AdaptiveEmbedding(nn.Module):
    """adaptive.py:11-80. embeddings.{i} = Sequential(Embedding, Linear)."""

    def __init__(self, cutoff, initial_dim, output_dim, padding_idx=0,
                 factor=1.0, scale_embeds=True):
        super().__init__()
        self.cutoff = list(cutoff)
        self.padding_idx = padding_idx
        self.embed_scale = math.sqrt(output_dim) if scale_embeds else 1.0
        self.output_dim = output_dim
        self.embeddings = nn.ModuleList()
        prev = 0
        for i, c in enumerate(self.cutoff):
            band_v = c - prev
            d = int(initial_dim // (factor ** i))
            emb = nn.Embedding(band_v, d, padding_idx if i == 0 else None)
            proj = nn.Linear(d, output_dim, bias=False)
            std = math.sqrt(1.0 / d)
            emb.weight.data.normal_(mean=0, std=std)
            emb.weight.data[padding_idx].fill_(0)
            nn.init.xavier_uniform_(proj.weight)
            self.embeddings.append(nn.Sequential(emb, proj))
            prev = c

    def weights_for_band(self, band: int):
        return (self.embeddings[band][0].weight,
                self.embeddings[band][1].weight)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        result = x.new_zeros(x.shape + (self.output_dim,),
                             dtype=torch.float32)
        prev = 0
        for i, c in enumerate(self.cutoff):
            mask = (x >= prev) & (x < c)
            idx = (x.clamp(prev, c - 1) - prev)
            e = self.embeddings[i](idx)
            result = result + torch.where(mask.unsqueeze(-1), e,
                                          torch.zeros_like(e))
            prev = c
        return self.embed_scale * result


class GehringLinear(nn.Linear):
    """linear.py:8-34: fan-in normal init + torch weight_norm (g, v)."""

    def __init__(self, in_features, out_features, dropout=0, bias=True):
        self.dropout = dropout
        super().__init__(in_features, out_features, bias)
        nn.utils.weight_norm(self)

    def reset_parameters(self):
        std = math.sqrt((1 - getattr(self, "dropout", 0)) / self.in_features)
        self.weight.data.normal_(mean=0, std=std)
        if self.bias is not None:
            self.bias.data.fill_(0)


class MultiHeadAttention(nn.Module):
    """multi_head.py:207-552 with add_bias_kv + add_zero_attn (defaults)."""

    def __init__(self, embed_dim, num_heads, kdim=None, vdim=None):
        super().__init__()
        self.embed_dim = embed_dim
        self.kdim = kdim or embed_dim
        self.vdim = vdim or embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.qkv_same_dim = (self.kdim == embed_dim
                             and self.vdim == embed_dim)
        if self.qkv_same_dim:
            self.in_proj_weight = nn.Parameter(
                torch.Tensor(3 * embed_dim, embed_dim))
            nn.init.xavier_uniform_(self.in_proj_weight)
        else:
            self.k_proj_weight = nn.Parameter(
                torch.Tensor(embed_dim, self.kdim))
            self.v_proj_weight = nn.Parameter(
                torch.Tensor(embed_dim, self.vdim))
            self.q_proj_weight = nn.Parameter(
                torch.Tensor(embed_dim, embed_dim))
            for w in (self.k_proj_weight, self.v_proj_weight,
                      self.q_proj_weight):
                nn.init.xavier_uniform_(w)
        self.in_proj_bias = nn.Parameter(torch.zeros(3 * embed_dim))
        self.out_proj = nn.Linear(embed_dim, embed_dim, bias=True)
        nn.init.xavier_uniform_(self.out_proj.weight)
        nn.init.constant_(self.out_proj.bias, 0.0)
        self.bias_k = nn.Parameter(torch.Tensor(1, 1, embed_dim))
        self.bias_v = nn.Parameter(torch.Tensor(1, 1, embed_dim))
        nn.init.xavier_normal_(self.bias_k)
        nn.init.xavier_normal_(self.bias_v)

    def _proj_q(self, x):
        w = (self.in_proj_weight[:self.embed_dim]
             if self.qkv_same_dim else self.q_proj_weight)
        return F.linear(x, w, self.in_proj_bias[:self.embed_dim])

    def _proj_k(self, x):
        w = (self.in_proj_weight[self.embed_dim:2 * self.embed_dim]
             if self.qkv_same_dim else self.k_proj_weight)
        return F.linear(x, w,
                        self.in_proj_bias[self.embed_dim:2 * self.embed_dim])

    def _proj_v(self, x):
        w = (self.in_proj_weight[2 * self.embed_dim:]
             if self.qkv_same_dim else self.v_proj_weight)
        return F.linear(x, w, self.in_proj_bias[2 * self.embed_dim:])

    def forward(self, query, key, value, key_padding_mask=None):
        """query [B, T, E], key/value [B, S, kdim/vdim],
        key_padding_mask [B, S] True = PAD. Returns [B, T, E]."""
        B, T, E = query.shape
        H, hd = self.num_heads, self.head_dim
        q = self._proj_q(query) * (hd ** -0.5)
        k = self._proj_k(key)
        v = self._proj_v(value)
        # bias_k/bias_v slot (multi_head.py:355-374)
        k = torch.cat([k, self.bias_k.expand(B, 1, E)], dim=1)
        v = torch.cat([v, self.bias_v.expand(B, 1, E)], dim=1)
        if key_padding_mask is not None:
            key_padding_mask = torch.cat(
                [key_padding_mask,
                 key_padding_mask.new_zeros(B, 1)], dim=1)
        # add_zero_attn slot (multi_head.py:417-427)
        k = torch.cat([k, k.new_zeros(B, 1, E)], dim=1)
        v = torch.cat([v, v.new_zeros(B, 1, E)], dim=1)
        if key_padding_mask is not None:
            key_padding_mask = torch.cat(
                [key_padding_mask,
                 key_padding_mask.new_zeros(B, 1)], dim=1)
        S = k.shape[1]
        q = q.view(B, T, H, hd).transpose(1, 2)
        k = k.view(B, S, H, hd).transpose(1, 2)
        v = v.view(B, S, H, hd).transpose(1, 2)
        scores = q @ k.transpose(-1, -2)
        if key_padding_mask is not None:
            scores = scores.masked_fill(
                key_padding_mask.unsqueeze(1).unsqueeze(2), float("-inf"))
        probs = torch.softmax(scores.float(), dim=-1).type_as(scores)
        out = (probs @ v).transpose(1, 2).reshape(B, T, E)
        return self.out_proj(out)


class DynamicConv(nn.Module):
    """dynamic.py:25-361, causal (padding_l = K-1), weight_softmax."""

    def __init__(self, input_size, kernel_size, num_heads):
        super().__init__()
        self.input_size = input_size
        self.kernel_size = kernel_size
        self.num_heads = num_heads
        self.weight_linear = nn.Linear(
            input_size, num_heads * kernel_size, bias=False)
        nn.init.xavier_uniform_(self.weight_linear.weight)

    def _weights(self, x):
        H, K = self.num_heads, self.kernel_size
        w = self.weight_linear(x).view(*x.shape[:-1], H, K)
        return torch.softmax(w.float(), dim=-1).type_as(w)

    def forward(self, x):
        """Full-sequence causal. x [B, T, C] -> [B, T, C]."""
        B, T, C = x.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        w = self._weights(x)                       # [B, T, H, K]
        x_pad = F.pad(x.view(B, T, H, R), (0, 0, 0, 0, K - 1, 0))
        out = torch.zeros_like(x.view(B, T, H, R))
        for k in range(K):
            out = out + w[:, :, :, k:k + 1] * x_pad[:, k:k + T]
        return out.reshape(B, T, C)

    def step(self, x_t, buf):
        """x_t [B, C], buf [B, K-1, C] oldest-first -> (out, new_buf)."""
        B, C = x_t.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        w = self._weights(x_t)                     # [B, H, K]
        hist = torch.cat([buf, x_t.unsqueeze(1)], dim=1)
        hh = hist.view(B, K, H, R)
        out = torch.einsum("bhk,bkhr->bhr", w, hh).reshape(B, C)
        return out, hist[:, 1:]


class TiedLinear(nn.Module):
    """linear.py:36-50 — shares another module's weight Parameter.

    The shared Parameter re-registers here, so state dicts carry
    duplicate keys (`head.word_proj.weight`, `tail.{i}.2.weight`)
    exactly like a real `best.th`; the porter ignores them.
    """

    def __init__(self, weight: nn.Parameter, transpose: bool):
        super().__init__()
        self.weight = weight
        self.transpose = transpose

    def forward(self, x):
        w = self.weight.t() if self.transpose else self.weight
        return F.linear(x, w)


class TiedHeadModule(nn.Module):
    """softmax.py:11-40 (input_dim == emb_dim case: word_proj is tied)."""

    def __init__(self, tied_emb: nn.Parameter, input_dim: int,
                 n_classes: int):
        super().__init__()
        self.word_proj = TiedLinear(tied_emb, transpose=False)
        self.class_proj = nn.Linear(input_dim, n_classes, bias=False)
        nn.init.xavier_uniform_(self.class_proj.weight)

    def forward(self, x):
        return torch.cat([self.word_proj(x), self.class_proj(x)], dim=-1)


class AdaptiveSoftmax(nn.Module):
    """softmax.py:43-222 with tie_adaptive_weights, tie_proj=False."""

    def __init__(self, vocab_size, input_dim, cutoff, adaptive_inputs,
                 factor=1.0):
        super().__init__()
        self.vocab_size = vocab_size
        self.cutoff = list(cutoff)
        tied_emb0, _ = adaptive_inputs.weights_for_band(0)
        self.head = TiedHeadModule(tied_emb0, input_dim,
                                   len(self.cutoff) - 1)
        self.tail = nn.ModuleList()
        for i in range(len(self.cutoff) - 1):
            tied_emb, tied_proj = adaptive_inputs.weights_for_band(i + 1)
            proj = nn.Linear(input_dim, tied_proj.shape[1], bias=False)
            nn.init.xavier_uniform_(proj.weight)
            self.tail.append(nn.Sequential(
                proj, nn.Dropout(0.0), TiedLinear(tied_emb, False)))

    def get_log_prob(self, x):
        """x [N, D] -> [N, V] full-vocab log-probs (softmax.py:193-222)."""
        c0 = self.cutoff[0]
        head_lp = F.log_softmax(self.head(x).float(), dim=-1)
        parts = [head_lp[:, :c0]]
        for i, tail in enumerate(self.tail):
            t = F.log_softmax(tail(x).float(), dim=-1)
            parts.append(t + head_lp[:, c0 + i, None])
        return torch.cat(parts, dim=-1)

    def adaptive_loss(self, x, target, padding_idx=1):
        """The reference training criterion (adaptive_loss.py:27-73):
        per-cluster F.cross_entropy with ignore_index=padding_idx —
        including the fairseq quirk that an IN-TAIL RELATIVE index
        equal to padding_idx is silently ignored. Returns
        (loss_sum, ntokens)."""
        c0 = self.cutoff[0]
        head_target = target.clone()
        for i in range(1, len(self.cutoff)):
            lo, hi = self.cutoff[i - 1], self.cutoff[i]
            head_target[(target >= lo) & (target < hi)] = c0 + i - 1
        loss = F.cross_entropy(self.head(x), head_target,
                               ignore_index=padding_idx,
                               reduction="sum")
        for i, tail in enumerate(self.tail):
            lo, hi = self.cutoff[i], self.cutoff[i + 1]
            m = (target >= lo) & (target < hi)
            if m.any():
                loss = loss + F.cross_entropy(
                    tail(x[m]), target[m] - lo,
                    ignore_index=padding_idx, reduction="sum")
        ntokens = (target != padding_idx).sum()
        return loss, ntokens


class DynamicConvDecoderLayer(nn.Module):
    """decoder_flattened.py:212-359 (normalize_before=False)."""

    def __init__(self, embed_dim, conv_dim, kernel_size, num_heads,
                 ffn_dim, image_dim, article_dim):
        super().__init__()
        self.linear1 = GehringLinear(embed_dim, 2 * conv_dim)
        self.conv = DynamicConv(conv_dim, kernel_size, num_heads)
        self.linear2 = GehringLinear(conv_dim, embed_dim)
        self.conv_layer_norm = nn.LayerNorm(embed_dim)
        self.context_attns = nn.ModuleDict({
            "image": MultiHeadAttention(embed_dim, num_heads,
                                        kdim=image_dim, vdim=image_dim),
            "article": MultiHeadAttention(embed_dim, num_heads,
                                          kdim=article_dim,
                                          vdim=article_dim),
        })
        self.context_attn_lns = nn.ModuleDict({
            "image": nn.LayerNorm(embed_dim),
            "article": nn.LayerNorm(embed_dim),
        })
        self.context_fc = GehringLinear(2 * embed_dim, embed_dim)
        self.fc1 = GehringLinear(embed_dim, ffn_dim)
        self.fc2 = GehringLinear(ffn_dim, embed_dim)
        self.final_layer_norm = nn.LayerNorm(embed_dim)

    def _after_conv(self, x, contexts):
        parts = []
        for name in ("image", "article"):
            residual = x
            xc = self.context_attns[name](
                x, contexts[name], contexts[name],
                key_padding_mask=contexts.get(f"{name}_mask"))
            xc = self.context_attn_lns[name](residual + xc)
            parts.append(xc)
        x = self.context_fc(torch.cat(parts, dim=-1))
        x = self.final_layer_norm(x + self.fc2(F.relu(self.fc1(x))))
        return x

    def forward(self, x, contexts):
        residual = x
        h = F.glu(self.linear1(x), dim=-1)
        h = self.conv(h)
        x = self.conv_layer_norm(residual + self.linear2(h))
        return self._after_conv(x, contexts)

    def step(self, x_t, contexts, buf):
        residual = x_t
        h = F.glu(self.linear1(x_t), dim=-1)
        h, buf = self.conv.step(h, buf)
        x = self.conv_layer_norm(residual + self.linear2(h))
        x = self._after_conv(x.unsqueeze(1), contexts)[:, 0]
        return x, buf


class TellDecoder(nn.Module):
    """Reference-keyed flagship decoder (decoder_flattened.py:22-146)."""

    def __init__(self, vocab_size=50265, embed_dim=1024, ffn_dim=4096,
                 num_heads=16, kernel_sizes=(3, 7, 15, 31),
                 cutoff=(5000, 20000, 50265), image_dim=2048,
                 article_dim=1024, padding_idx=0, pos_padding_idx=1,
                 max_positions=512):
        super().__init__()
        self.vocab_size = vocab_size
        self.pos_padding_idx = pos_padding_idx

        class _SumEmbedder(nn.Module):
            def __init__(self):
                super().__init__()
                self.token_embedder_adaptive = AdaptiveEmbedding(
                    cutoff, embed_dim, embed_dim, padding_idx)
                self.token_embedder_position = \
                    SinusoidalPositionalEmbedding(
                        embed_dim, pos_padding_idx, max_positions)

            def forward(self, x, start_pos=0):
                return (self.token_embedder_adaptive(x)
                        + self.token_embedder_position(x, start_pos))

        self.embedder = _SumEmbedder()
        self.layers = nn.ModuleList([
            DynamicConvDecoderLayer(embed_dim, embed_dim, k, num_heads,
                                    ffn_dim, image_dim, article_dim)
            for k in kernel_sizes
        ])
        self.adaptive_softmax = AdaptiveSoftmax(
            vocab_size, embed_dim, cutoff,
            self.embedder.token_embedder_adaptive)
        self.kernel_sizes = list(kernel_sizes)
        self.embed_dim = embed_dim

    @torch.no_grad()
    def log_prob(self, token_ids, contexts):
        """Teacher-forced full-vocab log-probs [B, T, V]."""
        x = self.embedder(token_ids)
        for layer in self.layers:
            x = layer(x, contexts)
        B, T, D = x.shape
        lp = self.adaptive_softmax.get_log_prob(x.reshape(-1, D))
        return lp.view(B, T, self.vocab_size)

    @torch.no_grad()
    def generate_greedy(self, B, contexts, max_len=20, bos_id=0,
                        eos_id=2, pad_id=1):
        """Reference-style incremental greedy decode."""
        bufs = [torch.zeros(B, k - 1, self.embed_dim)
                for k in self.kernel_sizes]
        tok = torch.full((B,), bos_id, dtype=torch.long)
        finished = torch.zeros(B, dtype=torch.bool)
        out = [tok]
        for i in range(max_len):
            x = self.embedder(tok.unsqueeze(1), start_pos=i)[:, 0]
            for li, layer in enumerate(self.layers):
                x, bufs[li] = layer.step(x, contexts, bufs[li])
            lp = self.adaptive_softmax.get_log_prob(x)
            nxt = lp.argmax(-1)
            nxt = torch.where(finished, torch.full_like(nxt, pad_id), nxt)
            finished = finished | (nxt == eos_id)
            out.append(nxt)
            tok = nxt
        return torch.stack(out, dim=1)
