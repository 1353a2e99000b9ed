"""Table-structure token registry for MDU (document-understanding) tasks.

Equivalent of the reference's TOKEN_REGISTRY
(/root/reference/markushgrapher/core/common/utils.py:23-152): 126 table
structure tokens (OTSL cell markers, HTML-ish table tags, colspan/rowspan
attributes) mapped onto reserved `<other_N>` ids. The reference's id
assignment is historical accretion, not a formula (e.g. `xcel=<other_125>`,
`colspan="20"=<other_126>`, rowspan 50+ skips `<other_97>`), so the exact
table is vendored as a data artifact (`vendor/token_registry.json`, see
`vendor/README.md`) and golden-tested id-for-id against the reference when
it is mounted — MDU-table checkpoints require byte-exact ids. These ids are
reused contextually: MDU table tasks and Markush (CX)SMILES tasks never
share a batch, so both vocabularies map from `<other_0>` like the reference
does.
"""

from __future__ import annotations

import json
import os
from typing import Dict


def build_token_registry() -> Dict[str, str]:
    path = os.path.join(os.path.dirname(__file__), "vendor",
                        "token_registry.json")
    with open(path, encoding="utf-8") as f:
        return json.load(f)


TOKEN_REGISTRY: Dict[str, str] = build_token_registry()
TOKEN_REGISTRY_INVERSE: Dict[str, str] = {
    v: k for k, v in TOKEN_REGISTRY.items()}


import re as _re


def _registry_regex():
    """One alternation over registry tokens, longest first; purely
    alphanumeric tokens (ecel, nl, ...) only match at word boundaries so
    they never fire inside ordinary words ("only" contains "nl")."""
    parts = []
    for tok in sorted(TOKEN_REGISTRY, key=len, reverse=True):
        esc = _re.escape(tok)
        if tok.isalnum():
            esc = rf"\b{esc}\b"
        parts.append(esc)
    return _re.compile("|".join(parts))


_REGISTRY_RE = _registry_regex()


def encode_table_tokens(text: str, tokenizer) -> List[int]:
    """Replace registry tokens with their `<other_N>` ids; everything else
    goes through the base tokenizer (no EOS)."""
    ids: List[int] = []
    pos = 0
    for m in _REGISTRY_RE.finditer(text):
        if m.start() > pos:
            ids.extend(tokenizer.encode(text[pos:m.start()])[:-1])
        ids.append(tokenizer._convert_token_to_id(TOKEN_REGISTRY[m.group(0)]))
        pos = m.end()
    if pos < len(text):
        ids.extend(tokenizer.encode(text[pos:])[:-1])
    return ids


def decode_table_tokens(ids, tokenizer) -> str:
    pieces = tokenizer.convert_ids_to_tokens(ids)
    out = []
    for p in pieces:
        if p in TOKEN_REGISTRY_INVERSE:
            out.append(TOKEN_REGISTRY_INVERSE[p])
        elif p in ("<pad>", "</s>"):
            continue
        else:
            out.append(p)
    return "".join(out).replace("▁", " ").strip()
