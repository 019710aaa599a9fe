"""End-to-end bf16 serving gates (VERDICT r4 weak-4 / next-5).

bench.py serves every family in bfloat16 while the golden tests gate fp32,
so nothing bounded the CUMULATIVE bf16 error of a whole serving graph — two
round-4 bugs (families that had never run in serving precision) were found
by profiling accident, and writing THESE tests found a third (the QuickVC
speaker-encoder LSTM initialized its scan carry in f32, upcasting the whole
downstream graph until a conv dtype crash).

Protocol per family:
  * durations/lengths are pinned by running pass ONE (encode) in fp32 and
    feeding both precisions' decode from it — in bf16 the duration networks
    legitimately round a frame differently, which would shift the whole
    waveform and make SNR meaningless; duration agreement is gated
    SEPARATELY (predicted frames within a small tolerance of fp32);
  * the decode graph (where the serving FLOPs are: flow x4 + generator +
    fused tail, or the compounding CFM ODE + vocoder) is gated by waveform
    SNR / relative mel error of bf16 vs fp32 on identical alignments.

Thresholds are calibrated on CPU at ~2x margin below measured values (CPU
bf16 rounds per-op — at least as lossy as the TPU's f32-accumulating MXU).
A dtype-promotion regression (silent f32 upcast is an error the OTHER way —
caught by the dtype asserts; silent precision loss or a crash moves these
gates by orders of magnitude).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree)


def snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    err = np.sum((ref - got) ** 2)
    if err == 0:
        return np.inf
    return float(10.0 * np.log10(np.sum(ref**2) / err))


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def test_vits2_bf16_serving(rng):
    """MB-iSTFT-VITS2: fp32 encode pins durations; the bf16 decode graph
    (flow x4 + generator + fused tail) is SNR-gated; the bf16 ENCODE pass
    must agree with fp32 on predicted frames within a small tolerance."""
    from vosk_tts_tpu.models import vits2 as M

    cfg = M.VITS2Config(
        n_vocab=20, spec_channels=13, segment_size=8, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=3,
        kernel_size=3, p_dropout=0.0, resblock="1",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
        upsample_rates=(4, 4), upsample_initial_channel=64,
        upsample_kernel_sizes=(16, 16), gen_istft_n_fft=16,
        gen_istft_hop_size=4, subbands=4, n_speakers=4, gin_channels=16,
        use_sdp=True, use_spk_conditioned_encoder=True,
        use_transformer_flows=True, transformer_flow_type="pre_conv2",
        decoder_type="mb_istft", istft_mode="torch",
    )
    params = M.synthesizer_init(jax.random.PRNGKey(0), cfg)
    p16 = to_bf16(params)
    x = jnp.asarray(rng.integers(1, cfg.n_vocab, size=(1, 16)).astype(np.int32))
    xl = jnp.asarray([16], jnp.int32)
    sid = jnp.asarray([2], jnp.int32)
    r = jax.random.PRNGKey(5)

    enc32 = M.encode_for_infer(params, cfg, x, xl, sid, rng=r)
    enc16 = M.encode_for_infer(p16, cfg, x, xl, sid, rng=r)
    pred32 = int(enc32["pred_frames"][0])
    pred16 = int(enc16["pred_frames"][0])
    assert abs(pred16 - pred32) <= max(2, int(0.06 * pred32)), (pred16, pred32)

    # decode both precisions from the SAME fp32 durations/means
    enc_cast = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
                for k, v in enc32.items()}
    out32 = M.decode_from_durations(params, cfg, enc32, sid, rng=r, max_frames=64)
    out16 = M.decode_from_durations(p16, cfg, enc_cast, sid, rng=r, max_frames=64)
    assert out16["wav"].dtype == jnp.bfloat16  # no silent f32 upcast
    n = int(out32["wav_lengths"][0])
    assert int(out16["wav_lengths"][0]) == n
    s = snr_db(out32["wav"][0, :n, 0], out16["wav"][0, :n, 0])
    assert s > 12.0, f"bf16 VITS2 decode SNR {s:.1f} dB below gate"  # measured 15.1


def test_stabletts_bf16_serving(rng):
    """StableTTS: fp32 encode pins durations; bf16 decode (4-step CFM ODE,
    where per-step error compounds) + Vocos is gated on relative mel error
    and waveform SNR."""
    from vosk_tts_tpu.models import stabletts as S
    from vosk_tts_tpu.models import vocoder as V

    cfg = S.StableTTSConfig(
        n_vocab=30, n_feats=8, n_spks=4, spk_emb_dim=16, hidden_channels=32,
        filter_channels=64, n_heads=2, n_layers=2, kernel_size=3,
        p_dropout=0.0, phone_emb_dim=12, punc_emb_dim=4, bert_dim=24,
        bert_proj_dim=4, dp_out_channels=50, dec_hidden=32, dec_filter=64,
        dec_layers=2, dec_heads=2, dec_kernel=3,
    )
    params = S.matcha_init(jax.random.PRNGKey(1), cfg)
    p16 = to_bf16(params)
    vcfg = V.VocosConfig(input_channels=cfg.n_feats, dim=32, intermediate_dim=64,
                         num_layers=2, n_fft=16, hop_length=4)
    vparams = V.vocos_init(jax.random.PRNGKey(2), vcfg)

    b, t = 1, 12
    x = jnp.asarray(rng.integers(0, cfg.n_vocab, size=(b, 5, t)).astype(np.int32))
    xl = jnp.asarray([t], jnp.int32)
    bert = jnp.asarray(rng.standard_normal((b, t, cfg.bert_dim)).astype(np.float32))
    sid = jnp.asarray([1], jnp.int32)
    r = jax.random.PRNGKey(9)

    enc32 = S.encode_for_synth(params, cfg, x, xl, sid, bert)
    enc16 = S.encode_for_synth(p16, cfg, x, xl, sid, bert.astype(jnp.bfloat16))
    pred32 = int(enc32["pred_frames"][0])
    pred16 = int(enc16["pred_frames"][0])
    assert abs(pred16 - pred32) <= max(2, int(0.06 * pred32)), (pred16, pred32)

    enc_cast = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
                for k, v in enc32.items()}
    # temperature=0 pins the ODE start to z=0: jax.random draws differ by a
    # rounding in bf16, and 4 Euler steps through a random-init network
    # amplify that start difference into alignment-sized error — the gate
    # targets COMPUTE precision, so both precisions integrate from z=0
    out32 = S.decode_from_durations(params, cfg, enc32, sid, rng=r,
                                    max_frames=64, n_timesteps=4, temperature=0.0)
    out16 = S.decode_from_durations(p16, cfg, enc_cast, sid, rng=r,
                                    max_frames=64, n_timesteps=4, temperature=0.0)
    nf = int(out32["mel_lengths"][0])
    assert int(out16["mel_lengths"][0]) == nf
    mel32 = np.asarray(out32["mel"], np.float32)
    mel16 = np.asarray(out16["mel"], np.float32)
    rel = np.mean(np.abs(mel32[0, :nf] - mel16[0, :nf])) / (np.std(mel32[0, :nf]) + 1e-8)
    assert rel < 0.12, f"bf16 StableTTS mel error {rel:.4f} above gate"

    wav32 = np.asarray(V.vocos_apply(vparams, vcfg, out32["mel"]), np.float32)
    wav16 = np.asarray(V.vocos_apply(to_bf16(vparams), vcfg, out16["mel"]), np.float32)
    s = snr_db(wav32[0, : nf * vcfg.hop_length], wav16[0, : nf * vcfg.hop_length])
    assert s > 10.0, f"bf16 StableTTS+Vocos waveform SNR {s:.1f} dB below gate"


def test_quickvc_bf16_serving(rng):
    """QuickVC: whole VC serving graph (LSTM speaker embed + posterior +
    reverse flow + MS-iSTFT decode) in bf16 vs fp32. This graph CRASHED in
    bf16 before round 5 (f32 LSTM carry upcast)."""
    from vosk_tts_tpu.models import quickvc as Q

    cfg = Q.QuickVCConfig(
        spec_channels=65, inter_channels=32, hidden_channels=32,
        upsample_initial_channel=64, gin_channels=16, ssl_dim=24,
    )
    params = Q.synthesizer_init(jax.random.PRNGKey(3), cfg)
    c = jnp.asarray(rng.standard_normal((1, 40, 24)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((1, 200, 80)).astype(np.float32))
    r = jax.random.PRNGKey(4)

    w32 = Q.infer(params, cfg, c, tgt, rng=r)
    w16 = Q.infer(to_bf16(params), cfg, c.astype(jnp.bfloat16),
                  tgt.astype(jnp.bfloat16), rng=r)
    assert w16.dtype == jnp.bfloat16  # no silent f32 upcast
    s = snr_db(np.asarray(w32, np.float32), np.asarray(w16, np.float32))
    assert s > 15.0, f"bf16 QuickVC serving SNR {s:.1f} dB below gate"


def test_gpt_sovits_bf16_serving(rng):
    """SoVITS token->wave decode in bf16 vs fp32, plus an AR-decode bf16
    smoke (valid tokens, no dtype crash — the AR samples integers, so token
    flips at near-ties are legitimate and not gated)."""
    from vosk_tts_tpu.models import gpt_sovits as G

    cfg = G.SoVITSConfig(
        spec_channels=65, inter_channels=32, hidden_channels=32, filter_channels=64,
        n_layers=4, upsample_initial_channel=64, upsample_rates=(4, 4),
        upsample_kernel_sizes=(16, 16), gin_channels=32, ssl_dim=16, n_codes=20,
        n_symbols=30, mrte_hidden=32, style_hidden=16, segment_size=8,
    )
    params = G.sovits_init(jax.random.PRNGKey(5), cfg)
    codes = jnp.asarray(rng.integers(0, 20, size=(1, 20)).astype(np.int32))
    text = jnp.asarray(rng.integers(0, 30, size=(1, 9)).astype(np.int32))
    refer = jnp.asarray(rng.standard_normal((1, 30, 65)).astype(np.float32))
    r = jax.random.PRNGKey(6)

    w32 = G.sovits_decode(params, cfg, codes, text, jnp.asarray([9], jnp.int32),
                          refer, jnp.asarray([30], jnp.int32), rng=r)
    w16 = G.sovits_decode(to_bf16(params), cfg, codes, text,
                          jnp.asarray([9], jnp.int32),
                          refer.astype(jnp.bfloat16),
                          jnp.asarray([30], jnp.int32), rng=r)
    s = snr_db(np.asarray(w32, np.float32), np.asarray(w16, np.float32))
    assert s > 15.0, f"bf16 SoVITS decode SNR {s:.1f} dB below gate"

    acfg = G.ARConfig(embedding_dim=32, hidden_dim=32, num_head=4, num_layers=2,
                      vocab_size=40, phoneme_vocab_size=30, bert_dim=24, eos=39)
    ap = to_bf16(G.ar_init(jax.random.PRNGKey(7), acfg))
    phones = jnp.asarray(rng.integers(0, 30, size=(1, 8)).astype(np.int32))
    abert = jnp.asarray(rng.standard_normal((1, 8, acfg.bert_dim)).astype(np.float32))
    prompt = jnp.asarray(rng.integers(0, 39, size=(1, 5)).astype(np.int32))
    tokens, n = G.ar_infer(ap, acfg, phones, abert.astype(jnp.bfloat16), prompt,
                           rng=jax.random.PRNGKey(8), max_new=12, top_k=3)
    toks = np.asarray(tokens)
    assert toks.shape == (1, 12) and (toks >= 0).all() and (toks < 40).all()
