"""Faithful PyTorch re-implementation of the reference TGNC model.

Reproduces, with reference-identical state-dict keys and math, the
template-guided decoder + classifier of
/root/reference/ttl/tell/models/tgnc.py:19-120 and
/root/reference/ttl/tell/models/decoder_tgnc.py:20-250:

- trunk `decoder.layers.{i}` (shared dynamic-conv layers) plus five
  per-template `decoder.head{t}` ModuleLists each holding ONE extra
  kernel-31-style layer (`decoder.head{t}.0.*` keys);
- head outputs stacked, weighted elementwise by
  sigmoid(template_logits) and mean-reduced (decoder_tgnc.py:239-243);
- ClassificationHead: <s> article hidden + mean image feats ->
  dense -> tanh -> out_proj (tgnc.py:19-38).

Purpose: a stand-in for a real tgnc `best.th` so `port_tgnc_model` /
`port_checkpoint` and torch-vs-JAX parity tests run without the
upstream checkpoint. Keys match a real one.
"""

from __future__ import annotations

import torch
import torch.nn as nn

from torch_tell_decoder import DynamicConvDecoderLayer, TellDecoder


class TellTGNCDecoder(TellDecoder):
    """TellDecoder trunk + per-template head layers (decoder_tgnc.py)."""

    def __init__(self, n_templates=5, head_kernel=31, ffn_dim=4096,
                 num_heads=16, image_dim=2048, article_dim=1024, **kw):
        super().__init__(ffn_dim=ffn_dim, num_heads=num_heads,
                         image_dim=image_dim, article_dim=article_dim,
                         **kw)
        self.n_templates = n_templates
        self.head_kernel = head_kernel
        for t in range(n_templates):
            setattr(self, f"head{t}", nn.ModuleList([
                DynamicConvDecoderLayer(
                    self.embed_dim, self.embed_dim, head_kernel,
                    num_heads, ffn_dim, image_dim, article_dim)]))

    def heads(self):
        return [getattr(self, f"head{t}")[0]
                for t in range(self.n_templates)]

    @torch.no_grad()
    def mixed_hidden(self, token_ids, contexts, template_logits):
        """Trunk then sigmoid-mixed heads (decoder_tgnc.py:140-243)."""
        x = self.embedder(token_ids)
        for layer in self.layers:
            x = layer(x, contexts)
        outs = [head(x, contexts) for head in self.heads()]
        stacked = torch.stack(outs, dim=2)        # [B, T, n, D]
        prob = torch.sigmoid(template_logits)     # [B, n]
        return (stacked * prob.unsqueeze(1).unsqueeze(3)).mean(dim=2)

    @torch.no_grad()
    def mixed_log_prob(self, token_ids, contexts, template_logits):
        x = self.mixed_hidden(token_ids, contexts, template_logits)
        B, T, D = x.shape
        lp = self.adaptive_softmax.get_log_prob(x.reshape(-1, D))
        return lp.view(B, T, self.vocab_size)


class ClassificationHead(nn.Module):
    """tgnc.py:19-38 (dims parameterized for small-test use)."""

    def __init__(self, embed_dim=1024, image_dim=2048, n_classes=5):
        super().__init__()
        self.dense = nn.Linear(embed_dim + image_dim, embed_dim)
        self.dropout = nn.Dropout(0.1)
        self.out_proj = nn.Linear(embed_dim, n_classes)

    def forward(self, hidden_states, x_image):
        h = hidden_states[:, 0, :]
        img = x_image.mean(dim=1)
        h = torch.cat([h, img], dim=-1)
        h = torch.tanh(self.dense(h))
        return self.out_proj(h)


class TellTGNC(nn.Module):
    """Reference-keyed tgnc model (keys: decoder.*, classifier.*)."""

    def __init__(self, embed_dim=1024, image_dim=2048, n_templates=5,
                 **decoder_kwargs):
        super().__init__()
        self.decoder = TellTGNCDecoder(
            n_templates=n_templates, embed_dim=embed_dim,
            image_dim=image_dim, **decoder_kwargs)
        self.classifier = ClassificationHead(
            embed_dim, image_dim, n_templates)

    @torch.no_grad()
    def caption_loss(self, caption_ids, contexts, article, image,
                     pad_id=1):
        """Teacher-forced bits/token through the mixed heads."""
        import math
        template_logits = self.classifier(article, image)
        inp, tgt = caption_ids[:, :-1], caption_ids[:, 1:]
        x = self.decoder.mixed_hidden(inp, contexts, template_logits)
        loss, ntokens = self.decoder.adaptive_softmax.adaptive_loss(
            x.reshape(-1, x.shape[-1]), tgt.reshape(-1).long(),
            padding_idx=pad_id)
        return loss / ntokens / math.log(2)

    @torch.no_grad()
    def generate_greedy(self, B, contexts, article, image, max_len=16,
                        bos_id=0, eos_id=2, pad_id=1):
        """Incremental greedy decode through the mixed heads."""
        dec = self.decoder
        template_logits = self.classifier(article, image)
        prob = torch.sigmoid(template_logits)
        trunk_bufs = [torch.zeros(B, k - 1, dec.embed_dim)
                      for k in dec.kernel_sizes]
        head_bufs = [torch.zeros(B, dec.head_kernel - 1, dec.embed_dim)
                     for _ in range(dec.n_templates)]
        tok = torch.full((B,), bos_id, dtype=torch.long)
        finished = torch.zeros(B, dtype=torch.bool)
        out = [tok]
        for i in range(max_len):
            x = dec.embedder(tok.unsqueeze(1), start_pos=i)[:, 0]
            for li, layer in enumerate(dec.layers):
                x, trunk_bufs[li] = layer.step(x, contexts,
                                               trunk_bufs[li])
            outs = []
            for t, head in enumerate(dec.heads()):
                h, head_bufs[t] = head.step(x, contexts, head_bufs[t])
                outs.append(h)
            stacked = torch.stack(outs, dim=1)        # [B, n, D]
            mixed = (stacked * prob.unsqueeze(2)).mean(dim=1)
            lp = dec.adaptive_softmax.get_log_prob(mixed)
            nxt = lp.argmax(-1)
            nxt = torch.where(finished, torch.full_like(nxt, pad_id),
                              nxt)
            finished = finished | (nxt == eos_id)
            out.append(nxt)
            tok = nxt
        return torch.stack(out, dim=1)
