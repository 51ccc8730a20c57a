"""In-environment text corpus + tokenizer for the tiny-model accuracy gate.

The reference's accuracy claim (README.md:14, algorithm/main.py:96-121) is a
measured end-metric: wikitext-2 perplexity fp16 vs quantized on trained
weights. This environment ships no model weights and only LFS-stub datasets,
so the gate is closed the only honest way available: train a small
LLaMA-shape model from scratch on text that exists here (package docs,
library sources, licenses) and run the exact same fp16-vs-quantized ppl flow
on it.

Corpus construction is deterministic: a fixed walk order, content-hash
dedup, a fixed-seed document shuffle, and a document-level train/val/test
split, so every run of ``build_corpus`` reproduces byte-identical splits.
"""

from __future__ import annotations

import hashlib
import os
import random
from typing import Iterable, List, Sequence, Tuple

# Document separator: a blank-line paragraph break keeps the stream natural
# for an LM while still giving the splitter clean document boundaries.
DOC_SEP = "\n\n"

_TEXT_EXT = (".md", ".rst", ".txt")
_CODE_EXT = (".py",)
_SKIP_DIR_PARTS = (
    "/tests/", "/test/", "/__pycache__/", "/.git/", "/node_modules/",
    "/locale/", "/locales/",
)
_SKIP_NAMES = ("changelog", "requirements", "entry_points", "record", "authors")


def _printable_ratio(s: str) -> float:
    if not s:
        return 0.0
    good = sum(1 for c in s if c.isprintable() or c in "\n\t ")
    return good / len(s)


def _read_doc(path: str, max_bytes: int = 4 << 20) -> str | None:
    try:
        if os.path.getsize(path) > max_bytes:
            return None
        with open(path, "rb") as f:
            raw = f.read()
        text = raw.decode("utf-8")
    except (OSError, UnicodeDecodeError):
        return None
    if len(text) < 512:
        return None
    if _printable_ratio(text[:8192]) < 0.97:
        return None
    return text


def iter_corpus_files(roots: Sequence[str], include_code: bool = True) -> Iterable[str]:
    exts = _TEXT_EXT + (_CODE_EXT if include_code else ())
    for root in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            full = dirpath + "/"
            if any(part in full for part in _SKIP_DIR_PARTS):
                continue
            for name in sorted(filenames):
                low = name.lower()
                if not low.endswith(exts):
                    continue
                if any(s in low for s in _SKIP_NAMES):
                    continue
                yield os.path.join(dirpath, name)


def _unit_key(path: str, roots: Sequence[str]) -> str:
    """Source unit a file belongs to: the top-level package/dir under its
    root. The train/val/test split is by UNIT, not document — package docs
    are full of near-duplicates (licenses, vendored copies, boilerplate
    headers) that a document-level split leaks across the boundary
    (measured: doc-level split gave val ppl 1.25 = pure memorization)."""
    for root in roots:
        if path.startswith(root):
            rel = path[len(root) :].lstrip("/")
            top = rel.split("/", 1)[0]
            return f"{os.path.basename(root)}/{top}"
    return "misc"


def build_corpus(
    out_dir: str,
    roots: Sequence[str] | None = None,
    max_mb: int = 64,
    heldout_mb: float = 1.0,
    seed: int = 0,
) -> dict:
    """Walk ``roots``, dedup, split by source unit, write train/val/test .txt.

    Val and test each get whole held-out units totalling ~``heldout_mb`` MB;
    everything else is train. Returns a manifest dict (also written to
    ``out_dir/MANIFEST.txt``).
    """
    if roots is None:
        import numpy

        site = os.path.dirname(os.path.dirname(numpy.__file__))
        roots = [site, "/usr/share/doc", "/usr/share/common-licenses", "/root/reference"]

    os.makedirs(out_dir, exist_ok=True)
    by_unit: dict = {}
    seen = set()
    total = 0
    budget = max_mb << 20
    for path in iter_corpus_files(roots):
        text = _read_doc(path)
        if text is None:
            continue
        digest = hashlib.sha256(text.encode("utf-8")).digest()
        if digest in seen:
            continue
        seen.add(digest)
        by_unit.setdefault(_unit_key(path, roots), []).append(text)
        total += len(text)
        if total >= budget:
            break

    # candidate held-out units: moderate size, not globally-duplicated
    # license text (common-licenses reappears verbatim inside every package)
    unit_bytes = {u: sum(len(d) for d in docs) for u, docs in by_unit.items()}
    candidates = sorted(
        u
        for u, b in unit_bytes.items()
        if 32_768 <= b <= 2 << 20 and "licenses" not in u and "doc/" not in u
    )
    rng = random.Random(seed)
    rng.shuffle(candidates)
    target = int(heldout_mb * (1 << 20))
    held: dict = {"val": [], "test": []}
    sizes = {"val": 0, "test": 0}
    for u in candidates:
        name = "val" if sizes["val"] <= sizes["test"] else "test"
        if sizes["val"] >= target and sizes["test"] >= target:
            break
        held[name].append(u)
        sizes[name] += unit_bytes[u]

    splits = {"val": [], "test": [], "train": []}
    for u, docs in sorted(by_unit.items()):
        if u in held["val"]:
            splits["val"].extend(docs)
        elif u in held["test"]:
            splits["test"].extend(docs)
        else:
            splits["train"].extend(docs)
    rng.shuffle(splits["train"])
    manifest = {
        "n_docs": sum(len(d) for d in by_unit.values()),
        "bytes": total,
        "seed": seed,
        "roots": list(roots),
        "val_units": sorted(held["val"]),
        "test_units": sorted(held["test"]),
    }
    for name, part in splits.items():
        p = os.path.join(out_dir, f"{name}.txt")
        with open(p, "w") as f:
            f.write(DOC_SEP.join(part))
        manifest[f"{name}_docs"] = len(part)
        manifest[f"{name}_bytes"] = os.path.getsize(p)
    with open(os.path.join(out_dir, "MANIFEST.txt"), "w") as f:
        for k, v in manifest.items():
            f.write(f"{k}: {v}\n")
    return manifest


def train_tokenizer(corpus_dir: str, vocab_size: int = 8192) -> str:
    """Byte-level BPE on train.txt -> ``corpus_dir/tokenizer.json``.

    Byte-level means no OOV; vocab_size is a multiple of 128 so the packed
    vocab GEMM (quantized lm_head) needs no padding.
    """
    from tokenizers import ByteLevelBPETokenizer

    tok = ByteLevelBPETokenizer()
    tok.train(
        [os.path.join(corpus_dir, "train.txt")],
        vocab_size=vocab_size,
        min_frequency=2,
        special_tokens=["<pad>", "<s>", "</s>"],
    )
    out = os.path.join(corpus_dir, "tokenizer.json")
    tok.save(out)
    return out


def encode_file(tokenizer_path: str, text_path: str, out_npy: str) -> int:
    """Tokenize a split to a flat uint16 token stream (vocab < 65536)."""
    import numpy as np
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(tokenizer_path)
    with open(text_path) as f:
        text = f.read()
    ids: List[int] = []
    # chunk the encode: the rust tokenizer is happiest on moderate strings
    step = 1 << 20
    for i in range(0, len(text), step):
        ids.extend(tok.encode(text[i : i + step]).ids)
    arr = np.asarray(ids, dtype=np.uint16)
    np.save(out_npy, arr)
    return int(arr.size)
