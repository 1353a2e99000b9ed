"""Tokenizer substrate tests: base vocab layout, SMILES splitting, Markush
grammar round-trips (reference behavior: markush_tokenizer.py)."""

import pytest

from markushgrapher_tpu.chem.smiles_tokenize import atomwise_tokenizer, is_atom_token
from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer
from markushgrapher_tpu.data.vocab import (
    EOS_ID,
    LOC_BASE_ID,
    PAD_ID,
    UNK_ID,
    VOCAB_TOTAL,
    MGTokenizer,
    build_base_vocab,
)


class TestBaseVocab:
    def test_layout_contract(self):
        vocab = build_base_vocab()
        assert len(vocab) == VOCAB_TOTAL
        assert vocab["<pad>"] == PAD_ID
        assert vocab["</s>"] == EOS_ID
        assert vocab["<unk>"] == UNK_ID
        # <loc_N> pinned to the id range the reference trainer uses for
        # loc-token MAE (curriculumTrainer.py:676-687)
        assert vocab["<loc_0>"] == 32500
        assert vocab["<loc_500>"] == 33000
        assert max(vocab.values()) == VOCAB_TOTAL - 1

    def test_encode_decode_roundtrip(self):
        tok = MGTokenizer()
        for text in ["hello world", "R1", "a halogen atom", "C1=CC=CC=C1"]:
            ids = tok.encode(text)
            assert ids[-1] == EOS_ID
            assert tok.decode(ids) == text

    def test_number_whole_pieces(self):
        tok = MGTokenizer()
        assert tok._convert_token_to_id("15") != UNK_ID
        assert len(tok.tokenize("15")) == 1
        # ids are distinct from single digits
        assert tok._convert_token_to_id("15") != tok._convert_token_to_id("1")

    def test_word_initial_vs_continuation(self):
        tok = MGTokenizer()
        pieces = tok.tokenize("ab ab")
        assert pieces == ["▁a", "b", "▁a", "b"]


class TestAtomwiseTokenizer:
    def test_basic(self):
        assert atomwise_tokenizer("CCO") == ["C", "C", "O"]
        assert atomwise_tokenizer("C1=CC=CC=C1") == [
            "C", "1", "=", "C", "C", "=", "C", "C", "=", "C", "1"]

    def test_two_letter_and_brackets(self):
        assert atomwise_tokenizer("ClBr[NH2+]") == ["Cl", "Br", "[NH2+]"]
        assert atomwise_tokenizer("C%12CC%12") == ["C", "%12", "C", "C", "%12"]

    def test_aromatic_and_wildcards(self):
        assert atomwise_tokenizer("c1ccccc1*") == ["c", "1", "c", "c", "c", "c", "c", "1", "*"]

    def test_is_atom_token(self):
        assert is_atom_token("C") and is_atom_token("[13CH3]") and is_atom_token("n")
        assert not is_atom_token("=") and not is_atom_token("1") and not is_atom_token("(")


class TestMarkushTokenizer:
    @pytest.fixture(scope="class")
    def mt(self):
        return MarkushTokenizer()

    def test_smi_roundtrip(self):
        mt = MarkushTokenizer(task="smiles")
        ids = mt.encode_smi("<smi>CC(=O)O</smi>")
        text = mt.decode(ids).replace(" ", "")
        assert text == "<smi>CC(=O)O</smi>"

    def test_smi_with_positions(self):
        mt = MarkushTokenizer(task="smiles", encode_position=True)
        ids = mt.encode_smi("<smi>CO![[0,0,100,100],[512,512,612,612]]</smi>")
        loc_ids = [i for i in ids if LOC_BASE_ID <= i <= LOC_BASE_ID + 500]
        assert len(loc_ids) == 8  # 2 atoms x 4 coords
        # quantization: 512*500/1024 = 250
        assert loc_ids[4] == LOC_BASE_ID + 250
        # decode drops loc tokens
        assert "loc" not in mt.decode(ids)

    def test_cxsmi_roundtrip_with_rgroup(self, mt):
        label = "<cxsmi>CC(<r>R1</r>)C</cxsmi>"
        ids = mt.encode_cxsmi(label)
        text = mt.decode(ids).replace(" ", "")
        assert text == label

    def test_cxsmi_extension_sections(self, mt):
        label = "<cxsmi>CC* |m:2:15.16.17,Sg:n:1,2:F:ht|</cxsmi>"
        ids = mt.encode_cxsmi(label)
        decoded = mt.decode(ids).replace(" ", "")
        assert "m:2:15.16.17" in decoded
        assert "Sg:n:1,2:F:ht" in decoded

    def test_stable_roundtrip(self, mt):
        label = "<stable>R1:methyl<n>ethyl<ns>R2:H</stable>"
        ids = mt.encode_stable(label)
        decoded = mt.decode(ids)
        stable = mt.get_stable(decoded)
        assert stable == {"R1": ["methyl", "ethyl"], "R2": ["H"]}

    def test_markush_full(self, mt):
        label = ("<markush><cxsmi>C<r>R1</r></cxsmi>"
                 "<stable>R1:F<n>Cl</stable></markush>")
        ids = mt.encode_markush(label)
        decoded = mt.decode(ids)
        assert "<markush>" in decoded and "</markush>" in decoded
        assert mt.get_stable(decoded) == {"R1": ["F", "Cl"]}

    def test_get_stable_range_expansion(self, mt):
        stable = mt.get_stable("<stable>n:1-4</stable>")
        assert stable == {"n": ["1", "2", "3", "4"]}

    def test_get_stable_truncated_prediction(self, mt):
        # incomplete generation without closing tags still parses
        stable = mt.get_stable("<stable>R1:F<n>Cl")
        assert stable == {"R1": ["F", "Cl"]}

    def test_compress_stable(self, mt):
        stable = {"R1": ["F"], "R2": ["F"], "n": ["1", "2", "3"]}
        compressed = mt.compress_stable(stable)
        assert compressed == {"R1,R2": ["F"], "n": "1-3"}

    def test_encode_index_tokens(self):
        mt = MarkushTokenizer(encode_index=True)
        ids = mt.encode_cxsmi("<cxsmi>CC</cxsmi>")
        raw = mt.decode_raw(ids)
        assert raw.count("<i>") == 2 and raw.count("</i>") == 2
        # decode skips index spans
        assert mt.decode(ids).replace(" ", "") == "<cxsmi>CC</cxsmi>"

    def test_encode_router(self, mt):
        assert mt.encode("<markush><cxsmi>C</cxsmi><stable>R:H</stable></markush>")[0] == \
            mt.tokenizer._convert_token_to_id(mt.vocabulary["<markush>"])
