"""Checkpoint-fidelity tokenizer tests.

Golden-tests the pure-python sentencepiece substrate (data/spm.py) against
the HF `tokenizers` Unigram implementation, round-trips the ModelProto wire
reader, and verifies the reference vocabulary importer reproduces the
reference's `<other_N>` assignment order (markush_tokenizer.py:160-285).
"""

import json
import os
import random
import string
import struct

import pytest

from markushgrapher_tpu.data import ref_vocab, spm
from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer

tokenizers = pytest.importorskip("tokenizers")

REF_VOCAB_DIR = "/root/reference/data/vocabulary"


def _random_unigram_vocab(rng, n_pieces=400):
    """A unigram inventory over ASCII with ▁-prefixed variants."""
    alphabet = string.ascii_lowercase + string.digits + "()[]=#+-@/\\.%:|,<>"
    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)]
    seen = {p for p, _ in pieces}
    # all single chars so every input is coverable
    for c in alphabet:
        for p in (c, spm.SP_SPACE + c):
            if p not in seen:
                seen.add(p)
                pieces.append((p, -rng.uniform(1.0, 12.0)))
    pieces.append((spm.SP_SPACE, -rng.uniform(1.0, 12.0)))
    seen.add(spm.SP_SPACE)
    while len(pieces) < n_pieces:
        ln = rng.randint(2, 6)
        body = "".join(rng.choice(alphabet) for _ in range(ln))
        p = (spm.SP_SPACE + body) if rng.random() < 0.4 else body
        if p not in seen:
            seen.add(p)
            pieces.append((p, -rng.uniform(1.0, 12.0)))
    return pieces


def _hf_unigram(pieces):
    from tokenizers import Tokenizer, models, pre_tokenizers

    t = Tokenizer(models.Unigram([(p, s) for p, s in pieces], unk_id=2, byte_fallback=False))
    t.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement=spm.SP_SPACE, prepend_scheme="always"
    )
    return t


def _sample_texts(rng, n=200):
    alphabet = string.ascii_lowercase + string.digits + "()[]=#+-@/\\.%:|,"
    texts = [
        "CC(=O)Oc1ccccc1C(=O)O",
        "[1*]c1ccc([2*])cc1 |m:2:5.6,Sg:n:3,4:n:ht|",
        "c1ccccc1 hello world 12 345",
        "R1 : C2-C6 alkyl <n> halogen",
    ]
    for _ in range(n):
        nw = rng.randint(1, 5)
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
            for _ in range(nw)
        ]
        texts.append(" ".join(words))
    return texts


class TestUnigramGolden:
    def test_matches_hf_tokenizers(self):
        rng = random.Random(0)
        pieces = _random_unigram_vocab(rng)
        ours = spm.SPMTokenizer(pieces, unk_id=2, pad_id=0, eos_id=1)
        theirs = _hf_unigram(pieces)
        for text in _sample_texts(rng):
            got = ours.encode(text, add_eos=False)
            want = theirs.encode(text).ids
            assert got == want, (text, ours.tokenize(text), theirs.encode(text).tokens)

    def test_unknown_chars_fuse(self):
        pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0),
                  (spm.SP_SPACE, -2.0), ("a", -1.0), (spm.SP_SPACE + "a", -1.0)]
        ours = spm.SPMTokenizer(pieces, unk_id=2)
        theirs = _hf_unigram(pieces)
        for text in ["aéæa", "é", "a££", "銀行 a"]:
            assert ours.encode(text, add_eos=False) == theirs.encode(text).ids


class TestModelProto:
    def test_roundtrip(self, tmp_path):
        pieces = [("<pad>", 0.0, spm.PIECE_CONTROL), ("</s>", 0.0, spm.PIECE_CONTROL),
                  ("<unk>", 0.0, spm.PIECE_UNKNOWN), (spm.SP_SPACE + "he", -2.5, spm.PIECE_NORMAL),
                  ("llo", -3.25, spm.PIECE_NORMAL), ("l", -1.0, spm.PIECE_NORMAL),
                  ("o", -1.5, spm.PIECE_NORMAL), (spm.SP_SPACE, -4.0, spm.PIECE_NORMAL)]
        blob = spm.write_model_proto(pieces)
        parsed = spm.parse_model_proto(blob)
        assert [(p, t) for p, _, t in parsed["pieces"]] == [(p, t) for p, _, t in pieces]
        for (p, s, _), (p2, s2, _) in zip(pieces, parsed["pieces"]):
            assert abs(s - s2) < 1e-6
        assert parsed["trainer"] == {"model_type": 1, "unk_id": 2}
        assert parsed["normalizer"]["add_dummy_prefix"] is True

        path = tmp_path / "spiece.model"
        path.write_bytes(blob)
        tok = spm.load_sentencepiece_model(str(path))
        assert tok.tokenize("hello") == [spm.SP_SPACE + "he", "llo"]
        # control pieces never match text
        assert "<pad>" not in tok.model.pieces
        assert tok.piece_to_id("<pad>") == 0

    def test_load_pretrained_spiece_with_added(self, tmp_path):
        pieces = [("<pad>", 0.0, spm.PIECE_CONTROL), ("</s>", 0.0, spm.PIECE_CONTROL),
                  ("<unk>", 0.0, spm.PIECE_UNKNOWN)]
        pieces += [(c, -2.0, spm.PIECE_NORMAL) for c in "abc("]
        pieces += [(spm.SP_SPACE + c, -2.0, spm.PIECE_NORMAL) for c in "abc("]
        (tmp_path / "spiece.model").write_bytes(spm.write_model_proto(pieces))
        added = {"<loc_0>": 32500, "<loc_500>": 33000, "<other_0>": 100, "<other_1>": 101}
        (tmp_path / "added_tokens.json").write_text(json.dumps(added))
        tok = spm.load_pretrained(str(tmp_path))
        assert tok.piece_to_id("<loc_0>") == 32500
        assert tok._convert_token_to_id("a") == tok.vocab["a"]
        # added tokens split before segmentation
        ids = tok.encode("a<loc_0>b", add_eos=False)
        assert 32500 in ids
        assert tok.num_other == 2

    def test_load_hf_tokenizer_json(self, tmp_path):
        from tokenizers import Tokenizer, models, pre_tokenizers
        from tokenizers.processors import TemplateProcessing

        vocab = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0),
                 (spm.SP_SPACE, -3.0)] + [
            (p, -2.0) for c in "abcxyz" for p in (c, spm.SP_SPACE + c)
        ]
        t = Tokenizer(models.Unigram(vocab, unk_id=2, byte_fallback=False))
        t.pre_tokenizer = pre_tokenizers.Metaspace(
            replacement=spm.SP_SPACE, prepend_scheme="always"
        )
        t.add_special_tokens(["<loc_7>", "<other_3>"])
        path = tmp_path / "tokenizer.json"
        t.save(str(path))
        ours = spm.load_hf_tokenizer_json(str(path))
        for text in ["abc xyz", "a<loc_7>b", "<other_3> ax"]:
            assert ours.encode(text, add_eos=False) == t.encode(text).ids


class TestVocabularyLoader:
    def test_duplicate_key_across_files_raises(self, tmp_path):
        """The reference extends a list without dedup (set_vocabulary,
        markush_tokenizer.py:276-281), so a key repeated across the ocsr_2
        multi-file set would shift every later <other_N> id; the importer
        fails loudly instead of silently re-indexing (ADVICE r2)."""
        names = ["ocsr_vocab_atoms.json", "ocsr_vocab_bonds.json",
                 "ocsr_vocab_chars.json"]
        inventories = [["C", "N"], ["-", "="], ["(", "C"]]  # "C" repeats
        for fn, keys in zip(names, inventories):
            (tmp_path / fn).write_text(json.dumps(keys))
        with pytest.raises(ValueError, match="duplicate vocabulary key 'C'"):
            ref_vocab.load_reference_vocabulary("ocsr_2", vocab_dir=str(tmp_path))

    def test_unique_keys_load_in_file_order(self, tmp_path):
        names = ["ocsr_vocab_atoms.json", "ocsr_vocab_bonds.json",
                 "ocsr_vocab_chars.json"]
        inventories = [["C", "N"], ["-", "="], ["("]]
        for fn, keys in zip(names, inventories):
            (tmp_path / fn).write_text(json.dumps(keys))
        full, atoms = ref_vocab.load_reference_vocabulary(
            "ocsr_2", vocab_dir=str(tmp_path))
        assert list(full) == ["C", "N", "-", "=", "("]
        assert list(full.values()) == [0, 1, 2, 3, 4]
        assert atoms == {"C": 0, "N": 1}


@pytest.mark.skipif(not os.path.isdir(REF_VOCAB_DIR), reason="reference vocab not mounted")
class TestReferenceVocabImport:
    def test_dispatch_table(self):
        assert ref_vocab.select_vocab_files("ocxsr_17") == (["ocxsr_12.json"], "ocxsr_12_atoms.json")
        assert ref_vocab.select_vocab_files("ocsr_3") == (["ocsr_3.json"], "ocsr_vocab_atoms.json")
        assert ref_vocab.select_vocab_files("ocsr_3", encode_position=True, grounded_smiles=True) == (
            ["ocsr_3_mol.json"], "ocsr_3_atoms.json")
        assert ref_vocab.select_vocab_files("ocsr_2")[0] == [
            "ocsr_vocab_atoms.json", "ocsr_vocab_bonds.json", "ocsr_vocab_chars.json"]
        assert ref_vocab.select_vocab_files("mdu_3008_aug") == (["ocsr_3.json"], "ocsr_vocab_atoms.json")

    def test_mdu_other_id_assignment(self):
        """Default (mdu) layout: 10 base markers then ocsr_3.json keys in
        file order — byte-for-byte the reference's set_vocabulary result."""
        mt = MarkushTokenizer(training_dataset_name="mdu")
        assert mt.task == "markush" and mt.substituents_separator == "<n>"
        base = ["<cxsmi>", "</cxsmi>", "<r>", "</r>", "<markush>", "</markush>",
                "<stable>", "</stable>", "<n>", "<ns>"]
        for i, tok in enumerate(base):
            assert mt.vocabulary[tok] == f"<other_{i}>"
        with open(os.path.join(REF_VOCAB_DIR, "ocsr_3.json")) as f:
            keys = list(json.load(f))
        assert mt.vocabulary[keys[0]] == "<other_10>"
        assert mt.vocabulary[keys[-1]] == f"<other_{10 + len(keys) - 1}>"
        assert mt.max_vocabulary_range == 10 + len(keys)
        with open(os.path.join(REF_VOCAB_DIR, "ocsr_vocab_atoms.json")) as f:
            assert mt.vocabulary_atoms == list(json.load(f))

    def test_mdu_300_uses_comma_separator(self):
        mt = MarkushTokenizer(training_dataset_name="mdu_300")
        assert mt.substituents_separator == ","
        assert mt.vocabulary[","] == "<other_8>"

    def test_ocsr_smiles_layout(self):
        mt = MarkushTokenizer(training_dataset_name="ocsr_3")
        assert mt.task == "smiles"
        assert mt.vocabulary["<smi>"] == "<other_0>"
        assert mt.vocabulary["</smi>"] == "<other_1>"
        with open(os.path.join(REF_VOCAB_DIR, "ocsr_3.json")) as f:
            keys = list(json.load(f))
        assert mt.vocabulary[keys[0]] == "<other_2>"

    def test_ocxsr_12_with_index(self):
        mt = MarkushTokenizer(training_dataset_name="ocxsr_12", encode_index=True)
        assert mt.vocabulary["<i>"] == "<other_10>"
        assert mt.vocabulary["</i>"] == "<other_11>"
        with open(os.path.join(REF_VOCAB_DIR, "ocxsr_12.json")) as f:
            keys = list(json.load(f))
        assert mt.vocabulary[keys[0]] == "<other_12>"
        with open(os.path.join(REF_VOCAB_DIR, "ocxsr_12_atoms.json")) as f:
            assert mt.vocabulary_atoms == list(json.load(f))

    def test_encode_golden_ids(self):
        """A CXSMILES encodes to a deterministic id sequence through the
        imported reference inventory + the self-contained base vocab."""
        mt = MarkushTokenizer(training_dataset_name="mdu")
        ids = mt.encode("<cxsmi>CC[1*] |m:1:2|</cxsmi>")
        # starts <cxsmi>, ends </cxsmi>
        assert ids[0] == mt._vid("<cxsmi>")
        assert ids[-1] == mt._vid("</cxsmi>")
        assert mt._vid("C") == mt.tokenizer._convert_token_to_id(mt.vocabulary["C"])
        # decoding inverts through vocabulary_inverse
        text = mt.decode(ids)
        assert "CC" in text.replace(" ", "") and "m:1:2" in text.replace(" ", "")


class TestSPMMarkushIntegration:
    def test_markush_tokenizer_over_spm_base(self, tmp_path):
        """The Markush layer runs unchanged over a checkpoint-style
        sentencepiece base with added <other_N>/<loc_N> tokens."""
        chars = string.ascii_letters + string.digits + "()[]=#+-@/\\.%:|,*$"
        pieces = [("<pad>", 0.0, spm.PIECE_CONTROL), ("</s>", 0.0, spm.PIECE_CONTROL),
                  ("<unk>", 0.0, spm.PIECE_UNKNOWN), (spm.SP_SPACE, -4.0, spm.PIECE_NORMAL)]
        pieces += [(p, -2.0, spm.PIECE_NORMAL) for c in chars for p in (c, spm.SP_SPACE + c)]
        pieces += [(str(n), -3.0, spm.PIECE_NORMAL) for n in range(10, 40)]
        (tmp_path / "spiece.model").write_bytes(spm.write_model_proto(pieces))
        base = len(pieces)
        added = {f"<other_{i}>": base + i for i in range(200)}
        added.update({f"<loc_{n}>": base + 200 + n for n in range(501)})
        (tmp_path / "added_tokens.json").write_text(json.dumps(added))

        tok = spm.load_pretrained(str(tmp_path))
        vocab_kwargs = {}
        if os.path.isdir(REF_VOCAB_DIR):
            mt = MarkushTokenizer(tokenizer=tok, training_dataset_name="mdu")
        else:
            mt = MarkushTokenizer(tokenizer=tok)
        label = "<markush><cxsmi>CC([1*])C |m:2:3.4|</cxsmi><stable>R1:C<n>N</stable></markush>"
        ids = mt.encode(label)
        assert ids[0] == tok.vocab[mt.vocabulary["<markush>"]]
        decoded = mt.decode(ids).replace(" ", "")
        assert "<markush>" in decoded and "<stable>" in decoded
        assert "m:2:3.4" in decoded


class TestBPEFallback:
    def test_bpe_tokenizer_json_via_wrapper(self, tmp_path):
        """Non-Unigram checkpoint tokenizers (the OCR stage's SmolLM2-style
        byte-level BPE) load through the tokenizers-library wrapper with the
        same API surface."""
        from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

        tok = Tokenizer(models.BPE(unk_token=None))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
        trainer = trainers.BpeTrainer(
            vocab_size=300, special_tokens=["<|endoftext|>"],
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
        tok.train_from_iterator(
            ["CC(=O)Oc1ccccc1", "perform ocr on this image",
             "<loc_12> hello world"], trainer)
        tok.add_special_tokens(["<loc_12>", "<other_0>", "<other_1>"])
        path = tmp_path / "tokenizer.json"
        tok.save(str(path))

        ours = spm.load_hf_tokenizer_json(str(path))
        assert isinstance(ours, spm.HFTokenizerWrapper)
        text = "CC(=O)Oc1ccccc1 <loc_12>"
        assert ours.encode(text, add_eos=False) == tok.encode(text).ids
        assert ours.piece_to_id("<loc_12>") == tok.token_to_id("<loc_12>")
        assert ours.num_other == 2
        rt = ours.decode(ours.encode("hello world", add_eos=False))
        assert rt.strip() == "hello world"


class TestPrecompiledCharsmap:
    """The darts-clone charsmap reader (spm.PrecompiledCharsmap) against a
    hand-built double-array: rule bytes are laid out with the real XOR
    addressing and unit encoding (offset<<10 | has_leaf<<8 | label), so the
    traversal path — root offset, label check incl. the bit-31 leaf mask,
    has_leaf -> value at the offset-xored position — is exercised exactly as
    a sentencepiece-shipped nmt_nfkc blob would."""

    @staticmethod
    def _blob():
        # rules: b"A" -> "a" (value 0), NBSP b"\xc2\xa0" -> " " (value 2),
        # b"AB" -> "!" (value 4, longest-match check)
        # Children hang off the POST-offset position ((p^offset)^label) and
        # a node's leaf value unit sits at p^offset itself — the traversal
        # state advances through the offset before the next label xor.
        units = [0] * 1024
        units[0] = 256 << 10                      # root offset 256
        # 'A' (0x41): node at 256^0x41=321, offset 320 -> state 1;
        # leaf value at 1, child 'B' at 1^0x42=67
        units[321] = (320 << 10) | 0x100 | 0x41
        units[1] = 0x80000000 | 0                 # value 0 -> "a"
        # 'A''B': node at 67, offset 65 -> leaf at 67^65=2
        units[67] = (65 << 10) | 0x100 | 0x42
        units[2] = 0x80000000 | 4                 # value 4 -> "!"
        # 0xC2: node at 256^0xC2=450, offset 512 -> state 962 (no leaf);
        # 0xA0 child at 962^0xA0=866, offset 865 -> leaf at 866^865=3
        units[450] = (512 << 10) | 0xC2
        units[866] = (865 << 10) | 0x100 | 0xA0
        units[3] = 0x80000000 | 6                 # value 6 -> " "
        trie = struct.pack(f"<{len(units)}I", *units)
        norm = b"a\x00!\x00!\x00 \x00"            # offsets 0, 2, 4, 6
        return struct.pack("<I", len(trie)) + trie + norm

    def test_longest_match_and_copy(self):
        cm = spm.PrecompiledCharsmap(self._blob())
        # single-byte rule, unmatched copy, longest match beats prefix
        assert cm.normalize("AxA") == "axa"
        assert cm.normalize("AB") == "!"
        # multi-byte rule: NBSP -> plain space; unmatched multi-byte copies
        assert cm.normalize("A B") == "a B"
        assert cm.normalize("é") == "é"

    def test_tokenizer_uses_charsmap(self, tmp_path):
        pieces = [("<pad>", 0.0, spm.PIECE_CONTROL),
                  ("</s>", 0.0, spm.PIECE_CONTROL),
                  ("<unk>", 0.0, spm.PIECE_UNKNOWN),
                  ("▁a", -1.0, spm.PIECE_NORMAL),
                  ("▁A", -1.0, spm.PIECE_NORMAL),
                  ("▁b", -1.5, spm.PIECE_NORMAL)]
        blob = self._blob()
        path = tmp_path / "spiece.model"
        path.write_bytes(spm.write_model_proto(pieces, charsmap=blob))
        tok = spm.load_sentencepiece_model(str(path))
        assert tok.charsmap is not None
        # "A" normalizes to "a" under the charsmap (NFKC would keep "A");
        # NBSP becomes a word separator via the " " rule + ws collapse
        assert tok.tokenize("A b") == ["▁a", "▁b"]
        # without a charsmap the same model keeps "A"
        path2 = tmp_path / "plain.model"
        path2.write_bytes(spm.write_model_proto(pieces))
        tok2 = spm.load_sentencepiece_model(str(path2))
        assert tok2.charsmap is None
        assert tok2.tokenize("A b") == ["▁A", "▁b"]


class TestCharsmapRobustness:
    """Round-3 advisor findings: tokenizer.json Precompiled extraction
    (medium), clean errors on malformed blobs (low), and
    remove_extra_whitespaces threading (low)."""

    _blob = staticmethod(TestPrecompiledCharsmap._blob)

    def test_tokenizer_json_extracts_charsmap(self, tmp_path):
        """The primary published-checkpoint path (tokenizer.json) must use
        the shipped Precompiled rules, both bare and inside a Sequence."""
        import base64
        import json as _json

        vocab = [["<pad>", 0.0], ["</s>", 0.0], ["<unk>", 0.0],
                 ["▁a", -1.0], ["▁A", -1.0], ["▁b", -1.5]]
        b64 = base64.b64encode(self._blob()).decode("ascii")
        for norm in (
            {"type": "Precompiled", "precompiled_charsmap": b64},
            {"type": "Sequence", "normalizers": [
                {"type": "Replace", "pattern": {"String": "\n"},
                 "content": " "},
                {"type": "Precompiled", "precompiled_charsmap": b64}]},
        ):
            spec = {"model": {"type": "Unigram", "vocab": vocab,
                              "unk_id": 2},
                    "normalizer": norm,
                    "pre_tokenizer": {"type": "Metaspace"},
                    "added_tokens": []}
            path = tmp_path / "tokenizer.json"
            path.write_text(_json.dumps(spec))
            tok = spm.load_hf_tokenizer_json(str(path))
            assert tok.charsmap is not None
            # "A" -> "a" comes only from the charsmap rules (NFKC keeps "A")
            assert tok.tokenize("A b") == ["▁a", "▁b"]

    def test_malformed_blob_raises_cleanly(self):
        # leaf-value position past the unit array: clean ValueError, not
        # IndexError
        units = [0] * 70
        units[0] = 0  # root offset 0
        units[0x41] = (4096 << 10) | 0x100 | 0x41  # leaf at 0x41^4096: OOR
        trie = struct.pack(f"<{len(units)}I", *units)
        cm = spm.PrecompiledCharsmap(struct.pack("<I", len(trie)) + trie)
        with pytest.raises(ValueError, match="malformed precompiled"):
            cm.normalize("A")
        # replacement section missing its NUL terminator
        blob = self._blob()
        cm2 = spm.PrecompiledCharsmap(blob[:-1])  # strips the " " rule NUL
        with pytest.raises(ValueError, match="NUL"):
            cm2.normalize("\u00a0")  # NBSP hits the truncated rule

    def test_remove_extra_whitespaces_threaded(self, tmp_path):
        pieces = [("<pad>", 0.0, spm.PIECE_CONTROL),
                  ("</s>", 0.0, spm.PIECE_CONTROL),
                  ("<unk>", 0.0, spm.PIECE_UNKNOWN),
                  ("▁a", -1.0, spm.PIECE_NORMAL),
                  ("▁", -2.0, spm.PIECE_NORMAL)]
        path = tmp_path / "keep_ws.model"
        path.write_bytes(spm.write_model_proto(
            pieces, remove_extra_whitespaces=False))
        tok = spm.load_sentencepiece_model(str(path))
        assert tok.remove_extra_whitespaces is False
        # a double space survives normalization -> an empty word segments
        # to a bare meta-space piece; the default collapse drops it
        assert tok.tokenize("a  a") == ["▁a", "▁", "▁a"]
        path2 = tmp_path / "collapse.model"
        path2.write_bytes(spm.write_model_proto(pieces))
        tok2 = spm.load_sentencepiece_model(str(path2))
        assert tok2.remove_extra_whitespaces is True
        assert tok2.tokenize("a  a") == ["▁a", "▁a"]
