"""Build trie-tokenizer vocab files (``token<TAB>score`` TSV).

The reference ships pre-built vocabs (data/*.vocab in the reference repo,
consumed via mlx.data's CharTrie — tokenizer.py:5). This tool regenerates
equivalent files from a local HuggingFace tokenizer so the repo does not
have to vendor third-party vocab dumps:

- T5/sentencepiece: tokens + log-probability scores from the sentencepiece
  model proto, with ``<pad> </s> <unk>`` pinned to the first rows (the
  layout ml_mdm_tpu.language_models.tokenizer expects for mode="t5").
- BERT wordpiece: vocab order preserved, scores all 0 (mode="bert"
  ignores scores).
- A plain word-list file (one token per line): scores from ``-log(rank)``.

Usage:
  python -m ml_mdm_tpu.clis.build_vocab --tokenizer google/flan-t5-xl \
      --output data/t5.vocab
  python -m ml_mdm_tpu.clis.build_vocab --wordlist words.txt --output out.vocab
"""
from __future__ import annotations

import argparse
import logging
import math
import sys


def vocab_from_sentencepiece(name_or_path: str):
    """(token, score) rows from a sentencepiece-backed HF tokenizer."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(name_or_path)
    sp = getattr(tok, "sp_model", None)
    rows = []
    if sp is not None:
        for i in range(sp.get_piece_size()):
            rows.append((sp.id_to_piece(i), float(sp.get_score(i))))
    else:  # fast tokenizer without the slow sp_model: flat scores
        vocab = sorted(tok.get_vocab().items(), key=lambda kv: kv[1])
        rows = [(t, 0.0) for t, _ in vocab]

    # pin the special rows the T5 dialect expects at the top
    specials = ["<pad>", "</s>", "<unk>"]
    head = [(s, 0.0) for s in specials]
    body = [(t, s) for t, s in rows if t not in specials]
    return head + body


def vocab_from_wordlist(path: str):
    rows = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0), ("▁", -2.0)]
    with open(path) as f:
        words = [w.strip() for w in f if w.strip()]
    for rank, w in enumerate(words):
        rows.append(("▁" + w, -math.log(rank + 2)))
    return rows


def write_vocab(rows, output: str):
    with open(output, "w") as f:
        for token, score in rows:
            f.write(f"{token}\t{score:.5f}\n")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tokenizer", default=None,
                        help="HF tokenizer name or local path")
    parser.add_argument("--wordlist", default=None,
                        help="plain word list, one token per line")
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    if bool(args.tokenizer) == bool(args.wordlist):
        parser.error("exactly one of --tokenizer / --wordlist is required")

    if args.tokenizer:
        rows = vocab_from_sentencepiece(args.tokenizer)
    else:
        rows = vocab_from_wordlist(args.wordlist)
    write_vocab(rows, args.output)
    logging.info("wrote %d tokens to %s", len(rows), args.output)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    sys.exit(main())
