"""CXSMILES (ChemAxon-extended SMILES) handling.

Replaces the reference's external `markushgenerator.CXSMILESTokenizer`
(load-bearing git dep: `convert_opt_to_out` turns the model's condensed
`cxsmiles_opt` into a standard CXSMILES for scoring,
utils_evaluation.py:207,231,323,361) and the section parsers in
utils_markush.py:84-104.

Grammar handled:
  SMILES |$lbl0;lbl1;...$,m:<anchor>:<i.j.k...>,Sg:n:<i,j,..>:<label>:<conn>|

 - `$...$`  per-atom labels (R-groups, attachment points `_AP1`),
 - `m:`     position-variation bonds (anchor atom : ring-atom candidates),
 - `Sg:`    repeating-group (polymer) sections,
 - `<r>LABEL</r>` inline R-group markers in cxsmiles_opt -> `*` atoms + labels.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

# rdkit_compat dispatches to RDKit when importable (reference-exact
# canonicalization/_smilesAtomOutputOrder) and to chem.mol otherwise
from markushgrapher_tpu.chem.rdkit_compat import (
    canonical_smiles_with_order,
    is_valid_smiles,
)
from markushgrapher_tpu.chem.smiles_tokenize import atomwise_tokenizer, is_atom_token


@dataclass
class MSection:
    anchor: int                  # index of the variable-position atom
    targets: List[int]           # candidate ring atoms

    def render(self) -> str:
        return f"m:{self.anchor}:{'.'.join(str(t) for t in self.targets)}"


@dataclass
class SgSection:
    kind: str                    # usually "n"
    atoms: List[int]
    label: str                   # repeat label, e.g. "n" or "3-5"
    connectivity: str = "ht"

    def render(self) -> str:
        return (f"Sg:{self.kind}:{','.join(str(a) for a in self.atoms)}:"
                f"{self.label}:{self.connectivity}")


@dataclass
class CXSmiles:
    smiles: str
    labels: List[str] = field(default_factory=list)   # per-atom, "" = none
    m_sections: List[MSection] = field(default_factory=list)
    sg_sections: List[SgSection] = field(default_factory=list)

    def render(self) -> str:
        parts: List[str] = []
        if any(self.labels):
            parts.append("$" + ";".join(self.labels) + "$")
        parts.extend(m.render() for m in self.m_sections)
        parts.extend(s.render() for s in self.sg_sections)
        if not parts:
            return self.smiles
        return f"{self.smiles} |{','.join(parts)}|"


def split_extension(cxsmiles: str) -> Tuple[str, str]:
    """'SMILES |ext|' -> (SMILES, ext)."""
    m = re.search(r"\|(.*)\|\s*$", cxsmiles)
    if not m:
        return cxsmiles.strip(), ""
    return cxsmiles[: m.start()].strip(), m.group(1)


def parse_m_section(text: str) -> MSection:
    """'m:0:15.16.17' (utils_markush.py parse_m_section)."""
    fields = text.split(":")
    return MSection(anchor=int(fields[1]),
                    targets=[int(t) for t in fields[2].split(".") if t != ""])


def parse_sg_section(text: str) -> SgSection:
    """'Sg:n:11,12:F:ht' (utils_markush.py parse_sg_section)."""
    fields = text.split(":")
    atoms = [int(a) for a in fields[2].split(",") if a != ""]
    label = fields[3] if len(fields) > 3 else ""
    conn = fields[4] if len(fields) > 4 else "ht"
    return SgSection(kind=fields[1], atoms=atoms, label=label,
                     connectivity=conn)


def parse_sections(ext: str) -> List[str]:
    """Split the |...| body into sections; Sg spans multiple commas
    (same merge rule as markush_tokenizer.py:466-480)."""
    raw = ext.split(",")
    out: List[str] = []
    i = 0
    while i < len(raw):
        part = raw[i]
        if part.startswith("Sg"):
            j = i + 1
            merged = part
            while j < len(raw) and not raw[j].startswith(("m:", "Sg")) \
                    and not raw[j].startswith("$"):
                merged += "," + raw[j]
                j += 1
            out.append(merged)
            i = j
        else:
            if part:
                out.append(part)
            i += 1
    return out


def parse_cxsmiles(cxsmiles: str) -> CXSmiles:
    smiles, ext = split_extension(cxsmiles)
    n_atoms = count_atoms(smiles)
    result = CXSmiles(smiles=smiles, labels=[""] * n_atoms)
    if not ext:
        return result
    # $...$ label block can contain commas-free labels separated by ';'
    label_match = re.search(r"\$(.*?)\$", ext)
    if label_match:
        labels = label_match.group(1).split(";")
        labels += [""] * (n_atoms - len(labels))
        result.labels = labels[:n_atoms]
        ext = (ext[: label_match.start()] + ext[label_match.end():]).strip(",")
    for section in parse_sections(ext):
        if section.startswith("m:"):
            result.m_sections.append(parse_m_section(section))
        elif section.startswith("Sg:"):
            result.sg_sections.append(parse_sg_section(section))
    return result


def count_atoms(smiles: str) -> int:
    return sum(1 for t in atomwise_tokenizer(smiles) if is_atom_token(t))


# -- cxsmiles_opt -> standard CXSMILES -------------------------------------------

_R_TAG = re.compile(r"<r>(.*?)</r>")


def convert_opt_to_out(cxsmiles_opt: str) -> str:
    """Condensed model output (inline `<r>LABEL</r>` R-groups) -> standard
    CXSMILES with `*` atoms and a `$...$` label section, preserving any
    m:/Sg: extension (markushgenerator `CXSMILESTokenizer.convert_opt_to_out`
    equivalent; call sites utils_evaluation.py:207-231)."""
    body, ext = split_extension(cxsmiles_opt)

    # split on <r>..</r> tags; count atoms in the plain segments between them
    labels: Dict[int, str] = {}
    out: List[str] = []
    atom_idx = 0
    pos = 0
    for m in _R_TAG.finditer(body):
        segment = body[pos:m.start()]
        out.append(segment)
        atom_idx += count_atoms(segment)
        labels[atom_idx] = m.group(1)
        out.append("*")
        atom_idx += 1
        pos = m.end()
    tail = body[pos:]
    out.append(tail)
    atom_idx += count_atoms(tail)

    smiles = "".join(out)
    n_atoms = atom_idx
    label_list = [labels.get(i, "") for i in range(n_atoms)]

    cx = CXSmiles(smiles=smiles, labels=label_list)
    if ext:
        for section in parse_sections(ext):
            if section.startswith("m:"):
                cx.m_sections.append(parse_m_section(section))
            elif section.startswith("Sg:"):
                cx.sg_sections.append(parse_sg_section(section))
            elif section.startswith("$"):
                # explicit label block in opt form (uncondensed labels)
                lbls = section.strip("$").split(";")
                for i, l in enumerate(lbls[:n_atoms]):
                    if l:
                        label_list[i] = l
    return cx.render()


def canonicalize_markush(cxsmiles: str) -> Optional[str]:
    """Canonical CXSMILES: canonicalize the SMILES and remap per-atom labels
    and m:/Sg: atom indices through the writer's atom output order
    (utils_markush.py canonicalize_markush:52-113)."""
    try:
        cx = parse_cxsmiles(cxsmiles)
        canon, output_order = canonical_smiles_with_order(cx.smiles)
    except Exception:
        return None
    # output_order[k] = old index of k-th written atom; build old->new
    old_to_new = {old: new for new, old in enumerate(output_order)}
    n = len(output_order)
    new_labels = [""] * n
    for old, lbl in enumerate(cx.labels[:n]):
        if lbl:
            new_labels[old_to_new[old]] = lbl
    new_m = [MSection(anchor=old_to_new.get(m.anchor, m.anchor),
                      targets=sorted(old_to_new.get(t, t) for t in m.targets))
             for m in cx.m_sections]
    new_m.sort(key=lambda m: (m.anchor, m.targets))
    new_sg = [SgSection(kind=s.kind,
                        atoms=sorted(old_to_new.get(a, a) for a in s.atoms),
                        label=s.label, connectivity=s.connectivity)
              for s in cx.sg_sections]
    new_sg.sort(key=lambda s: (s.atoms, s.label))
    return CXSmiles(smiles=canon, labels=new_labels, m_sections=new_m,
                    sg_sections=new_sg).render()


def is_valid_cxsmiles(cxsmiles: str) -> bool:
    """utils_markush.py is_valid_cxsmiles:246-253 with index-range guards
    (the reference guards against RDKit segfaults; here against bad remaps)."""
    try:
        cx = parse_cxsmiles(cxsmiles)
    except Exception:
        return False
    if not is_valid_smiles(cx.smiles):
        return False
    n = count_atoms(cx.smiles)
    for m in cx.m_sections:
        if m.anchor >= n or any(t >= n for t in m.targets):
            return False
    for s in cx.sg_sections:
        if any(a >= n for a in s.atoms):
            return False
    return True


def get_molecule_information(cxsmiles: str) -> Dict[str, bool]:
    """Presence of r/m/sg features (utils_evaluation.py
    get_molecule_information:736-774)."""
    try:
        cx = parse_cxsmiles(cxsmiles)
    except Exception:
        return {"r": False, "m": False, "sg": False}
    return {
        "r": any(cx.labels),
        "m": bool(cx.m_sections),
        "sg": bool(cx.sg_sections),
    }
