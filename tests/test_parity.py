"""Activation parity vs the stock torch UDOP implementation: convert a
randomly-initialized UdopForConditionalGeneration's weights into this
framework's VTL model and require matching encoder states and logits.

This is THE checkpoint-compatibility test (SURVEY.md §7 step 3: "per-layer
activation parity tests")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from markushgrapher_tpu.config import MarkushGrapherConfig, SwinConfig, VTLConfig
from markushgrapher_tpu.convert.from_torch import convert_udop_state_dict, graft_into
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel

pytestmark = pytest.mark.slow  # torch UDOP parity (imports transformers, ~4 min)

B, T, S = 2, 6, 5
D, LAYERS, HEADS, DKV, DFF, VOCAB = 32, 2, 4, 8, 64, 128
IMG, PATCH = 64, 16


@pytest.fixture(scope="module")
def setup():
    from transformers.models.udop import UdopConfig, UdopForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = UdopConfig(
        vocab_size=VOCAB, d_model=D, d_kv=DKV, d_ff=DFF, num_layers=LAYERS,
        num_decoder_layers=LAYERS, num_heads=HEADS, image_size=IMG,
        patch_size=PATCH, dropout_rate=0.0, feed_forward_proj="relu",
        tie_word_embeddings=False, decoder_start_token_id=0)
    hf = UdopForConditionalGeneration(hf_cfg).eval()

    cfg = MarkushGrapherConfig(
        vtl=VTLConfig(vocab_size=VOCAB, d_model=D, d_kv=DKV, d_ff=DFF,
                      num_layers=LAYERS, num_decoder_layers=LAYERS,
                      num_heads=HEADS, image_size=IMG, patch_size=PATCH,
                      dropout_rate=0.0),
        swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                        depths=(1,), num_heads=(2,), window_size=4),
        architecture_variant="none", max_seq_length=T,
        max_seq_length_decoder=S)
    model = MarkushGrapherModel(cfg, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    input_ids = rng.randint(3, VOCAB, size=(B, T))
    bbox = rng.rand(B, T, 4).astype(np.float32)
    bbox[:, -1] = 0.0  # a pad-style box
    mask = np.ones((B, T), np.int64)
    pixels = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    labels = rng.randint(3, VOCAB, size=(B, S))

    batch = dict(
        input_ids=jnp.asarray(input_ids, jnp.int32),
        bbox=jnp.asarray(bbox),
        attention_mask=jnp.asarray(mask, jnp.int32),
        labels=jnp.asarray(labels, jnp.int32),
        pixel_values=jnp.asarray(pixels),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)
    converted = convert_udop_state_dict(
        hf.state_dict(), num_layers=LAYERS, num_decoder_layers=LAYERS,
        num_heads=HEADS, d_kv=DKV, d_model=D, patch_size=PATCH)
    params = graft_into(params, converted)

    torch_inputs = dict(
        input_ids=torch.tensor(input_ids),
        bbox=torch.tensor(bbox, dtype=torch.float64),
        attention_mask=torch.tensor(mask),
        pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
        labels=torch.tensor(labels),
    )
    return model, params, batch, hf, torch_inputs


class TestUdopParity:
    def test_encoder_parity(self, setup):
        model, params, batch, hf, ti = setup
        with torch.no_grad():
            t_enc = hf.encoder(
                input_ids=ti["input_ids"], bbox=ti["bbox"],
                attention_mask=ti["attention_mask"],
                pixel_values=ti["pixel_values"]).last_hidden_state.numpy()
        j_enc, j_mask = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"], None,
            method=MarkushGrapherModel.encode)
        j_enc = np.asarray(j_enc)
        assert j_enc.shape == t_enc.shape
        np.testing.assert_allclose(j_enc, t_enc, atol=2e-4, rtol=1e-3)

    def test_logits_and_loss_parity(self, setup):
        model, params, batch, hf, ti = setup
        with torch.no_grad():
            t_out = hf(**ti)
        j_out = model.apply(params, **batch)
        np.testing.assert_allclose(
            np.asarray(j_out["logits"]), t_out.logits.numpy(),
            atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(
            float(j_out["loss"]), float(t_out.loss), atol=1e-4, rtol=1e-4)

    def test_greedy_generate_parity(self, setup):
        """Greedy decode must produce the same token ids as HF generate."""
        from markushgrapher_tpu.decode.generate import greedy_generate

        model, params, batch, hf, ti = setup
        max_len = 8
        with torch.no_grad():
            t_ids = hf.generate(
                input_ids=ti["input_ids"], bbox=ti["bbox"],
                attention_mask=ti["attention_mask"],
                pixel_values=ti["pixel_values"],
                max_new_tokens=max_len, num_beams=1, do_sample=False,
            ).numpy()
        enc, enc_mask = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"], None,
            method=MarkushGrapherModel.encode)
        j_ids = np.asarray(greedy_generate(
            model, params, enc, enc_mask, max_len, eos_id=1, pad_id=0))
        # HF prepends decoder_start (pad=0); compare the generated region,
        # treating everything after EOS as padding on both sides
        t_gen = t_ids[:, 1:1 + max_len]
        for b in range(t_gen.shape[0]):
            t_row, j_row = list(t_gen[b]), list(j_ids[b])
            t_trim = t_row[:t_row.index(1) + 1] if 1 in t_row else t_row
            j_trim = j_row[:j_row.index(1) + 1] if 1 in j_row else j_row
            assert t_trim == j_trim[:len(t_trim)] or j_trim == t_trim[:len(j_trim)], (
                t_row, j_row)


class TestBeamParity:
    def test_beam5_matches_hf_generate(self, setup):
        """Fixed-shape beam-5 must produce the same sequences as HF beam
        search on the converted model (the reference's predict mode,
        utils_evaluation.py:279-286)."""
        from markushgrapher_tpu.decode.generate import beam_generate

        model, params, batch, hf, ti = setup
        max_len = 10
        with torch.no_grad():
            t_ids = hf.generate(
                input_ids=ti["input_ids"], bbox=ti["bbox"],
                attention_mask=ti["attention_mask"],
                pixel_values=ti["pixel_values"],
                max_new_tokens=max_len, num_beams=5, do_sample=False,
                early_stopping=True, length_penalty=1.0,
            ).numpy()
        enc, enc_mask = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"], None,
            method=MarkushGrapherModel.encode)
        j_ids, _ = beam_generate(model, params, enc, enc_mask, max_len,
                                 num_beams=5, eos_id=1, pad_id=0)
        j_ids = np.asarray(j_ids)
        t_gen = t_ids[:, 1:1 + max_len]
        for b in range(t_gen.shape[0]):
            t_row, j_row = list(t_gen[b]), list(j_ids[b])
            t_trim = t_row[:t_row.index(1) + 1] if 1 in t_row else t_row
            j_trim = j_row[:j_row.index(1) + 1] if 1 in j_row else j_row
            assert t_trim == j_trim[:len(t_trim)] or \
                j_trim == t_trim[:len(j_trim)], (t_row, j_row)


def _fresh_pair(seed, vocab=VOCAB):
    """Build a fresh randomly-initialized HF UDOP + converted JAX model."""
    from transformers.models.udop import UdopConfig, UdopForConditionalGeneration

    torch.manual_seed(seed)
    hf_cfg = UdopConfig(
        vocab_size=vocab, d_model=D, d_kv=DKV, d_ff=DFF, num_layers=LAYERS,
        num_decoder_layers=LAYERS, num_heads=HEADS, image_size=IMG,
        patch_size=PATCH, dropout_rate=0.0, feed_forward_proj="relu",
        tie_word_embeddings=False, decoder_start_token_id=0)
    hf = UdopForConditionalGeneration(hf_cfg).eval()

    cfg = MarkushGrapherConfig(
        vtl=VTLConfig(vocab_size=vocab, d_model=D, d_kv=DKV, d_ff=DFF,
                      num_layers=LAYERS, num_decoder_layers=LAYERS,
                      num_heads=HEADS, image_size=IMG, patch_size=PATCH,
                      dropout_rate=0.0),
        swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                        depths=(1,), num_heads=(2,), window_size=4),
        architecture_variant="none", max_seq_length=T,
        max_seq_length_decoder=32)
    model = MarkushGrapherModel(cfg, dtype=jnp.float32)

    rng = np.random.RandomState(seed)
    input_ids = rng.randint(3, vocab, size=(B, T))
    bbox = rng.rand(B, T, 4).astype(np.float32)
    mask = np.ones((B, T), np.int64)
    pixels = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    batch = dict(
        input_ids=jnp.asarray(input_ids, jnp.int32),
        bbox=jnp.asarray(bbox),
        attention_mask=jnp.asarray(mask, jnp.int32),
        labels=jnp.asarray(rng.randint(3, vocab, size=(B, 4)), jnp.int32),
        pixel_values=jnp.asarray(pixels),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)
    converted = convert_udop_state_dict(
        hf.state_dict(), num_layers=LAYERS, num_decoder_layers=LAYERS,
        num_heads=HEADS, d_kv=DKV, d_model=D, patch_size=PATCH)
    params = graft_into(params, converted)
    ti = dict(
        input_ids=torch.tensor(input_ids),
        bbox=torch.tensor(bbox, dtype=torch.float64),
        attention_mask=torch.tensor(mask),
        pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
    )
    return model, params, batch, hf, ti


class TestBeamEdgeParity:
    """Token-for-token + score parity with HF `_beam_search`
    (transformers/generation/utils.py:3113-3404) including the hard edges:
    beams finishing mid-decode, the early-stop heuristic continuing past the
    first EOS (early_stopping=False), and early_stopping=True."""

    @pytest.mark.parametrize("seed,early_stopping", [
        (11, False), (12, False), (13, False), (11, True), (13, True)])
    def test_beam5_exact_tokens_and_scores(self, seed, early_stopping):
        from markushgrapher_tpu.decode.generate import beam_generate

        model, params, batch, hf, ti = _fresh_pair(seed)
        max_len = 24
        with torch.no_grad():
            t_out = hf.generate(
                input_ids=ti["input_ids"], bbox=ti["bbox"],
                attention_mask=ti["attention_mask"],
                pixel_values=ti["pixel_values"],
                max_new_tokens=max_len, num_beams=5, do_sample=False,
                early_stopping=early_stopping, length_penalty=1.0,
                return_dict_in_generate=True, output_scores=True)
        t_ids = t_out.sequences.numpy()[:, 1:]          # drop decoder start
        t_scores = t_out.sequences_scores.numpy()

        enc, enc_mask = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"], None,
            method=MarkushGrapherModel.encode)
        j_ids, j_scores = beam_generate(
            model, params, enc, enc_mask, max_len, num_beams=5, eos_id=1,
            pad_id=0, early_stopping=early_stopping)
        j_ids = np.asarray(j_ids)

        # token-for-token: HF crops to its max generated length; the JAX
        # tail beyond it must be pure padding
        n = t_ids.shape[1]
        np.testing.assert_array_equal(j_ids[:, :n], t_ids)
        assert np.all(j_ids[:, n:] == 0)
        np.testing.assert_allclose(np.asarray(j_scores), t_scores,
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("length_penalty", [0.6, 2.0])
    def test_beam5_nondefault_length_penalty(self, length_penalty):
        """Non-default length_penalty parity (PARITY.md gap: the shipped
        configs only exercise 1.0). Small vocab so beams finish mid-decode
        at different lengths — the penalty then actually reranks finished
        hypotheses (score / len**penalty, HF generation/utils.py)."""
        from markushgrapher_tpu.decode.generate import beam_generate

        model, params, batch, hf, ti = _fresh_pair(12, vocab=12)
        max_len = 24
        with torch.no_grad():
            t_out = hf.generate(
                input_ids=ti["input_ids"], bbox=ti["bbox"],
                attention_mask=ti["attention_mask"],
                pixel_values=ti["pixel_values"],
                max_new_tokens=max_len, num_beams=5, do_sample=False,
                early_stopping=False, length_penalty=length_penalty,
                return_dict_in_generate=True, output_scores=True)
        t_ids = t_out.sequences.numpy()[:, 1:]
        t_scores = t_out.sequences_scores.numpy()

        enc, enc_mask = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"], None,
            method=MarkushGrapherModel.encode)
        j_ids, j_scores = beam_generate(
            model, params, enc, enc_mask, max_len, num_beams=5, eos_id=1,
            pad_id=0, length_penalty=length_penalty)
        j_ids = np.asarray(j_ids)
        n = t_ids.shape[1]
        np.testing.assert_array_equal(j_ids[:, :n], t_ids)
        assert np.all(j_ids[:, n:] == 0)
        np.testing.assert_allclose(np.asarray(j_scores), t_scores,
                                   rtol=2e-4, atol=2e-4)

    def test_some_beam_finishes_mid_decode(self):
        """The scenario VERDICT flagged: an EOS lands mid-decode while other
        beams continue — guard that this case is actually exercised."""
        from markushgrapher_tpu.decode.generate import beam_generate

        hit_mid_eos = False
        for seed in (11, 12, 13):
            # small vocab -> EOS log-prob ~uniform -> beams finish mid-decode
            model, params, batch, hf, ti = _fresh_pair(seed, vocab=12)
            max_len = 24
            with torch.no_grad():
                t_ids = hf.generate(
                    input_ids=ti["input_ids"], bbox=ti["bbox"],
                    attention_mask=ti["attention_mask"],
                    pixel_values=ti["pixel_values"],
                    max_new_tokens=max_len, num_beams=5, do_sample=False,
                    early_stopping=False, length_penalty=1.0,
                ).numpy()[:, 1:]
            enc, enc_mask = model.apply(
                params, batch["input_ids"], batch["bbox"],
                batch["attention_mask"], batch["pixel_values"], None,
                method=MarkushGrapherModel.encode)
            j_ids, _ = beam_generate(model, params, enc, enc_mask, max_len,
                                     num_beams=5, eos_id=1, pad_id=0)
            j_ids = np.asarray(j_ids)
            n = t_ids.shape[1]
            # HF fills past-EOS slots with EOS when pad_token_id=0 (falsy
            # `pad or eos` in _beam_search); zero both tails before comparing
            def canon(a):
                a = a.copy()
                for row in a:
                    pos = np.where(row == 1)[0]
                    if pos.size:
                        row[pos[0] + 1:] = 0
                return a
            np.testing.assert_array_equal(canon(j_ids[:, :n]), canon(t_ids))
            assert np.all(canon(j_ids)[:, n:] == 0)
            for row in j_ids:
                pos = np.where(row == 1)[0]
                if pos.size and 0 < pos[0] < max_len - 1:
                    hit_mid_eos = True
        assert hit_mid_eos, "no seed produced a mid-decode EOS; adjust setup"


class TestBigConfigParity:
    """UDOP-base-scale single-block parity at f32 (VERDICT weak #7): the toy
    configs prove the math; this catches accumulation-order / broadcasting
    drift that only shows up at real widths (d_model 768, d_ff 2048, 12
    heads, full 33201 vocab, 256 image patches)."""

    @pytest.fixture(scope="class")
    def big(self):
        from transformers.models.udop import UdopConfig, UdopForConditionalGeneration

        D_, DKV_, DFF_, HEADS_, VOCAB_ = 768, 64, 2048, 12, 33201
        T_, S_, IMG_ = 64, 12, 256
        torch.manual_seed(42)
        hf_cfg = UdopConfig(
            vocab_size=VOCAB_, d_model=D_, d_kv=DKV_, d_ff=DFF_, num_layers=1,
            num_decoder_layers=1, num_heads=HEADS_, image_size=IMG_,
            patch_size=PATCH, dropout_rate=0.0, feed_forward_proj="relu",
            tie_word_embeddings=False, decoder_start_token_id=0)
        hf = UdopForConditionalGeneration(hf_cfg).eval()

        cfg = MarkushGrapherConfig(
            vtl=VTLConfig(vocab_size=VOCAB_, d_model=D_, d_kv=DKV_, d_ff=DFF_,
                          num_layers=1, num_decoder_layers=1, num_heads=HEADS_,
                          image_size=IMG_, patch_size=PATCH, dropout_rate=0.0),
            swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                            depths=(1,), num_heads=(2,), window_size=4),
            architecture_variant="none", max_seq_length=T_,
            max_seq_length_decoder=S_)
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)

        rng = np.random.RandomState(42)
        input_ids = rng.randint(3, 32000, size=(1, T_))
        bbox = rng.rand(1, T_, 4).astype(np.float32)
        mask = np.ones((1, T_), np.int64)
        pixels = rng.rand(1, IMG_, IMG_, 3).astype(np.float32)
        labels = rng.randint(3, 32000, size=(1, S_))
        batch = dict(
            input_ids=jnp.asarray(input_ids, jnp.int32),
            bbox=jnp.asarray(bbox),
            attention_mask=jnp.asarray(mask, jnp.int32),
            labels=jnp.asarray(labels, jnp.int32),
            pixel_values=jnp.asarray(pixels),
        )
        params = model.init(jax.random.PRNGKey(0), **batch)
        converted = convert_udop_state_dict(
            hf.state_dict(), num_layers=1, num_decoder_layers=1,
            num_heads=HEADS_, d_kv=DKV_, d_model=D_, patch_size=PATCH)
        params = graft_into(params, converted)
        ti = dict(
            input_ids=torch.tensor(input_ids),
            bbox=torch.tensor(bbox, dtype=torch.float64),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
            labels=torch.tensor(labels),
        )
        return model, params, batch, hf, ti

    def test_encoder_parity_at_width(self, big):
        model, params, batch, hf, ti = big
        with torch.no_grad():
            t_enc = hf.encoder(
                input_ids=ti["input_ids"], bbox=ti["bbox"],
                attention_mask=ti["attention_mask"],
                pixel_values=ti["pixel_values"]).last_hidden_state.numpy()
        j_enc, _ = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"], None,
            method=MarkushGrapherModel.encode)
        j_enc = np.asarray(j_enc)
        assert j_enc.shape == t_enc.shape
        # documented tolerance at real width: f32 reduction-order drift over
        # 768-wide layernorm + 2048-wide FF stays within 5e-4 absolute
        np.testing.assert_allclose(j_enc, t_enc, atol=5e-4, rtol=1e-3)

    def test_logits_and_loss_parity_at_width(self, big):
        model, params, batch, hf, ti = big
        with torch.no_grad():
            t_out = hf(**ti)
        j_out = model.apply(params, **batch)
        np.testing.assert_allclose(
            np.asarray(j_out["logits"]), t_out.logits.numpy(),
            atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(
            float(j_out["loss"]), float(t_out.loss), atol=5e-4, rtol=5e-4)
