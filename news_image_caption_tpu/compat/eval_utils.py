"""Gen-1 eval_utils surface: eval_split + language_eval.

Capability parity target: /root/reference/eval_utils.py:25-113,249-368 —
batched val/test loop producing (loss, predictions, lang_stats), with
`language_eval` computing BLEU-1..4 / ROUGE-L / CIDEr over prediction
dicts. pycocoevalcap is replaced by this repo's NumPy scorers.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from news_image_caption_tpu.evaluation.metrics import (BleuScorer,
                                                       CiderScorer,
                                                       RougeScorer)

SPECIALS = (0, 1, 2)


def decode_sequence(ix_to_word: Optional[Dict[int, str]],
                    tokens: np.ndarray) -> List[str]:
    """ids [B, T] -> list of caption strings (misc/utils.py:138-152).

    Stops each row at the first special id; unknown vocab falls back
    to `w{id}` tokens.
    """
    out = []
    for row in np.asarray(tokens):
        words = []
        for t in row:
            t = int(t)
            if t in SPECIALS:
                break
            words.append(ix_to_word.get(t, f"w{t}") if ix_to_word
                         else f"w{t}")
        out.append(" ".join(words))
    return out


def language_eval(preds: List[Dict[str, str]]) -> Dict[str, float]:
    """BLEU-1..4 / ROUGE-L / CIDEr over [{image_id, caption, gt}]
    (parity: eval_utils.py:25-93 minus the Java scorers)."""
    bleu, cider, rouge = BleuScorer(4), CiderScorer(), RougeScorer()
    for p in preds:
        refs = p["gt"] if isinstance(p["gt"], list) else [p["gt"]]
        hyp = p["caption"] or "<empty>"
        refs = [r or "<empty>" for r in refs]
        bleu += (hyp, refs)
        cider += (hyp, refs)
        rouge += (hyp, refs)
    b, _ = bleu.compute_score()
    c, _ = cider.compute_score()
    r, _ = rouge.compute_score()
    return {"Bleu_1": b[0], "Bleu_2": b[1], "Bleu_3": b[2],
            "Bleu_4": b[3], "ROUGE_L": r, "CIDEr": c}


def eval_split(model, params, batches: Iterable, *,
               ix_to_word: Optional[Dict[int, str]] = None,
               max_samples: Optional[int] = None,
               language_eval_flag: bool = True,
               max_len: int = 16
               ) -> Tuple[float, List[Dict], Dict[str, float]]:
    """Greedy-decode a split; returns (mean_loss, predictions, stats).

    `model` is any wrapper exposing loss_fn(params, batch) and
    sample(params, batch, max_len) (Gen-1) or generate(params, batch)
    (Gen-2/3 — duck-typed below).
    """
    total_loss, total_n = 0.0, 0
    preds: List[Dict] = []
    for batch in batches:
        loss, aux = model.loss_fn(params, batch)
        n = int(aux.get("sample_size", 1))
        total_loss += float(loss) * n
        total_n += n
        if hasattr(model, "sample"):
            toks = np.asarray(
                model.sample(params, batch, max_len=max_len)[0])
        else:
            # generate() includes the bos seed (a special id that
            # would terminate decoding at position 0) — strip it.
            toks = np.asarray(model.generate(params, batch)[0])[:, 1:]
        caps = decode_sequence(ix_to_word, toks)
        refs = decode_sequence(
            ix_to_word,
            np.asarray(batch.get("seq", batch.get("caption_ids")))[:, 1:])
        for i, (cap, ref) in enumerate(zip(caps, refs)):
            preds.append({"image_id": len(preds), "caption": cap,
                          "gt": [ref]})
        if max_samples is not None and len(preds) >= max_samples:
            break
    stats = language_eval(preds) if language_eval_flag else {}
    return total_loss / max(total_n, 1), preds, stats


def eval_split_visual_news(model, params, batches: Iterable, *,
                           ix_to_word: Optional[Dict[int, str]] = None,
                           max_samples: Optional[int] = None,
                           language_eval_flag: bool = True,
                           max_len: int = 16,
                           return_attention: bool = False
                           ) -> Tuple[float, List[Dict], Dict[str, float]]:
    """The visual-news eval loop variant (eval_utils.py:115-245).

    Same batched loss+sample loop as `eval_split`, plus the variant's
    extras: per-entry image metadata (`image_id`/`image_path` from
    batch infos) and optional per-token visual/sentence attention maps
    (`vis_att`/`sen_att`) when the model's sample returns them.
    """
    total_loss, total_n = 0.0, 0
    preds: List[Dict] = []
    for batch in batches:
        loss, aux = model.loss_fn(params, batch)
        n = int(aux.get("sample_size", 1))
        total_loss += float(loss) * n
        total_n += n
        atts = None
        if return_attention and hasattr(model, "sample_with_attention"):
            toks, _, atts = model.sample_with_attention(
                params, batch, max_len=max_len)
        elif hasattr(model, "sample"):
            toks, _ = model.sample(params, batch, max_len=max_len)
        else:
            toks = np.asarray(model.generate(params, batch)[0])[:, 1:]
        caps = decode_sequence(ix_to_word, np.asarray(toks))
        refs = decode_sequence(
            ix_to_word,
            np.asarray(batch.get("seq", batch.get("caption_ids")))[:, 1:])
        infos = batch.get("infos", [{}] * len(caps))
        for i, (cap, ref) in enumerate(zip(caps, refs)):
            entry = {"image_id": infos[i].get("id", len(preds)),
                     "caption": cap, "gt": [ref]}
            if "file_path" in infos[i]:
                entry["image_path"] = infos[i]["file_path"]
            if atts is not None:
                sen_len = max(len(cap.split()), 1)
                vis, sen = atts
                entry["vis_att"] = np.asarray(vis)[:sen_len, i].tolist()
                entry["sen_att"] = np.asarray(sen)[:sen_len, i].tolist()
            preds.append(entry)
        if max_samples is not None and len(preds) >= max_samples:
            break
    stats = language_eval(preds) if language_eval_flag else {}
    return total_loss / max(total_n, 1), preds, stats
