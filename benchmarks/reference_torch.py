"""Torch-CPU baseline: the reference's decode style, measured.

The reference repo cannot run here (AllenNLP/fairseq/pycocoevalcap are
absent), so this is an independent PyTorch implementation of the SAME
flagship architecture (4-layer dynamic-conv decoder, d=1024, 16 heads,
kernels [3,7,15,31], adaptive softmax cutoff [5000,20000]) executed
the way the reference executes generation
(/root/reference/ttl/tell/models/transformer_flattened.py:240-328):

- eager per-step Python loop (no compilation, no fusion);
- cross-attention K/V projected from the full contexts EVERY step
  (the reference passes incremental_state=None at the cross-attn call
  sites, decoder_flattened.py:300-325);
- dynamic-conv ring buffer per layer.

Run: python benchmarks/reference_torch.py  → prints captions/sec.
The number is recorded in BASELINE.md and bench.py.
"""

from __future__ import annotations

import math
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

V, D, FFN, H, LAYERS = 50265, 1024, 4096, 16, 4
KERNELS = [3, 7, 15, 31]
CUTOFF = [5000, 20000, V]
IMG_DIM, ART_DIM = 2048, 1024


class Layer(nn.Module):
    def __init__(self, K):
        super().__init__()
        self.K = K
        self.linear1 = nn.Linear(D, 2 * D)
        self.wlin = nn.Linear(D, H * K, bias=False)
        self.linear2 = nn.Linear(D, D)
        self.conv_ln = nn.LayerNorm(D)
        self.img_q = nn.Linear(D, D)
        self.img_k = nn.Linear(IMG_DIM, D)
        self.img_v = nn.Linear(IMG_DIM, D)
        self.img_o = nn.Linear(D, D)
        self.img_ln = nn.LayerNorm(D)
        self.art_q = nn.Linear(D, D)
        self.art_k = nn.Linear(ART_DIM, D)
        self.art_v = nn.Linear(ART_DIM, D)
        self.art_o = nn.Linear(D, D)
        self.art_ln = nn.LayerNorm(D)
        self.context_fc = nn.Linear(2 * D, D)
        self.fc1 = nn.Linear(D, FFN)
        self.fc2 = nn.Linear(FFN, D)
        self.final_ln = nn.LayerNorm(D)

    def attend(self, x, ctx, q, k, v, o):
        B = x.shape[0]
        hd = D // H
        Q = q(x).view(B, 1, H, hd).transpose(1, 2) * hd ** -0.5
        # K/V recomputed from the raw context every step (reference style)
        Kp = k(ctx).view(B, -1, H, hd).transpose(1, 2)
        Vp = v(ctx).view(B, -1, H, hd).transpose(1, 2)
        w = torch.softmax(Q @ Kp.transpose(-1, -2), dim=-1)
        out = (w @ Vp).transpose(1, 2).reshape(B, 1, D)
        return o(out)[:, 0]

    def step(self, x, image, article, buf):
        res = x
        h = F.glu(self.linear1(x), dim=-1)
        w = torch.softmax(self.wlin(h).view(-1, H, self.K), dim=-1)
        hist = torch.cat([buf, h.unsqueeze(1)], dim=1)  # [B, K, D]
        hh = hist.view(hist.shape[0], self.K, H, D // H)
        conv = torch.einsum("bhk,bkhr->bhr", w, hh).reshape(-1, D)
        x = self.conv_ln(res + self.linear2(conv))
        res = x
        xi = self.img_ln(res + self.attend(x, image, self.img_q,
                                           self.img_k, self.img_v,
                                           self.img_o))
        xa = self.art_ln(res + self.attend(x, article, self.art_q,
                                           self.art_k, self.art_v,
                                           self.art_o))
        x = self.context_fc(torch.cat([xi, xa], dim=-1))
        x = self.final_ln(x + self.fc2(F.relu(self.fc1(x))))
        return x, hist[:, 1:]


class Flagship(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = nn.Embedding(V, D)
        self.layers = nn.ModuleList([Layer(k) for k in KERNELS])
        # adaptive softmax: head + 2 tails (tied-size matmuls)
        self.head = nn.Linear(D, CUTOFF[0] + 2, bias=False)
        self.t1p = nn.Linear(D, D, bias=False)
        self.t1 = nn.Linear(D, CUTOFF[1] - CUTOFF[0], bias=False)
        self.t2p = nn.Linear(D, D, bias=False)
        self.t2 = nn.Linear(D, V - CUTOFF[1], bias=False)

    def log_prob(self, x):
        hl = F.log_softmax(self.head(x), dim=-1)
        p1 = F.log_softmax(self.t1(self.t1p(x)), -1) + hl[:, CUTOFF[0]:CUTOFF[0] + 1]
        p2 = F.log_softmax(self.t2(self.t2p(x)), -1) + hl[:, CUTOFF[0] + 1:CUTOFF[0] + 2]
        return torch.cat([hl[:, :CUTOFF[0]], p1, p2], dim=-1)

    @torch.no_grad()
    def generate(self, B, image, article, max_len=100):
        bufs = [torch.zeros(B, k - 1, D) for k in KERNELS]
        tok = torch.zeros(B, dtype=torch.long)
        out = [tok]
        for i in range(max_len):
            x = self.embed(tok) * math.sqrt(D)
            for li, layer in enumerate(self.layers):
                x, bufs[li] = layer.step(x, image, article, bufs[li])
            lp = self.log_prob(x)
            tok = lp.argmax(-1)
            out.append(tok)
        return torch.stack(out, 1)


def main():
    torch.manual_seed(0)
    B, P, S = 16, 49, 512
    model = Flagship().eval()
    image = torch.randn(B, P, IMG_DIM)
    article = torch.randn(B, S, ART_DIM)
    # warmup
    model.generate(B, image, article, max_len=5)
    t0 = time.perf_counter()
    model.generate(B, image, article, max_len=100)
    dt = time.perf_counter() - t0
    print(f"torch-cpu reference-style: {B / dt:.3f} captions/s "
          f"({dt:.2f}s for batch {B}, 100 steps)")


if __name__ == "__main__":
    main()
