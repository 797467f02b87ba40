"""Build a tiny random-weight HF Llama checkpoint + byte-level tokenizer,
fully offline (zero network).

The eval runners (`run_longbench.py` / `run_ruler.py` / `run_needle.py`)
take an HF checkpoint directory; real checkpoints are not fetchable in a
zero-egress container, so this makes a self-contained one for exercising
the ENTIRE pipeline end-to-end — real data files, real tokenisation,
real generation, real scoring — with a random-weight model (scores are
meaningless; the plumbing is real).

The tokenizer is a 259-symbol byte-level BPE (no merges): every string
roundtrips exactly, so truncation/insertion logic behaves like a real
tokenizer's.

Usage: python -m pyramidkv_tpu.runners.make_tiny_checkpoint --out /tmp/tiny
"""

from __future__ import annotations

import argparse


def build(out_dir: str, *, num_layers: int = 2, hidden: int = 64,
          heads: int = 4, kv_heads: int = 2, vocab: int = 512,
          max_pos: int = 8192, seed: int = 0) -> str:
    import torch
    import transformers
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    torch.manual_seed(seed)
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=2 * hidden,
        num_hidden_layers=num_layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(out_dir, safe_serialization=True)

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    tok_vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i, ch in enumerate(sorted(alphabet)):
        tok_vocab[ch] = i + 3
    tok = Tokenizer(models.BPE(vocab=tok_vocab, merges=[],
                               unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", model_max_length=max_pos)
    fast.save_pretrained(out_dir)
    return out_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--kv_heads", type=int, default=2)
    p.add_argument("--vocab", type=int, default=512)
    p.add_argument("--max_pos", type=int, default=8192)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    out = build(a.out, num_layers=a.num_layers, hidden=a.hidden,
                heads=a.heads, kv_heads=a.kv_heads, vocab=a.vocab,
                max_pos=a.max_pos, seed=a.seed)
    print(out)


if __name__ == "__main__":
    main()
