"""Converter parity for the auxiliary models: reference torch modules
(amt_apc.Model_SPEC2MIDI, beat_transformer.Demixed_DilatedTransformerModel)
vs our functional JAX forwards, weights ported via utils/torch_port.

These tests import the read-only reference implementation (guarded — skipped
when /root/reference is absent) purely as a parity oracle: random torch
weights are exported through the converter and both forwards must agree to
float tolerance. This is what guarantees published reference checkpoints run
correctly on TPU.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference repo not available"
)

torch = pytest.importorskip("torch")

if str(REFERENCE) not in sys.path:
    # APPEND (not insert) so the reference tree's top-level evaluate.py /
    # prepare.py never shadow this repo's CLI modules for other tests.
    sys.path.append(str(REFERENCE))


@pytest.fixture(scope="module")
def _no_grad():
    with torch.no_grad():
        yield


def test_amt_converter_parity(_no_grad):
    import jax.numpy as jnp
    from etude.models.amt_apc import (
        Decoder_SPEC2MIDI,
        Encoder_SPEC2MIDI,
        Model_SPEC2MIDI,
    )

    from etude_tpu.models.amt import AMTConfig, forward
    from etude_tpu.utils.torch_port import convert_amt_state_dict

    cfg = AMTConfig(
        n_margin=4, n_frame=16, n_bin=32, cnn_channel=2, cnn_kernel=3,
        hid_dim=32, encoder_n_layer=2, encoder_n_head=4,
        decoder_n_layer=2, decoder_n_head=4, pf_dim=64,
        n_note=12, n_velocity=8,
    )
    torch.manual_seed(0)
    enc = Encoder_SPEC2MIDI(
        cfg.n_margin, cfg.n_frame, cfg.n_bin, cfg.cnn_channel, cfg.cnn_kernel,
        cfg.hid_dim, cfg.encoder_n_layer, cfg.encoder_n_head, cfg.pf_dim,
        dropout=0.0, device="cpu",
    )
    dec = Decoder_SPEC2MIDI(
        cfg.n_frame, cfg.n_bin, cfg.n_note, cfg.n_velocity, cfg.hid_dim,
        cfg.decoder_n_layer, cfg.decoder_n_head, cfg.pf_dim,
        dropout=0.0, device="cpu",
    )
    model = Model_SPEC2MIDI(enc, dec).eval()

    rng = np.random.default_rng(1)
    spec = rng.normal(0, 1, (2, cfg.n_bin, 2 * cfg.n_margin + cfg.n_frame))
    spec = spec.astype(np.float32)

    (onset_a, offset_a, mpe_a, vel_a, _attn,
     onset_b, offset_b, mpe_b, vel_b) = model(torch.from_numpy(spec))

    params = convert_amt_state_dict(model.state_dict(), cfg)
    out = forward(params, cfg, jnp.asarray(spec), compute_dtype=jnp.float32)

    pairs = [
        (onset_a, out["onset_freq"]), (offset_a, out["offset_freq"]),
        (mpe_a, out["mpe_freq"]), (vel_a, out["velocity_freq"]),
        (onset_b, out["onset_time"]), (offset_b, out["offset_time"]),
        (mpe_b, out["mpe_time"]), (vel_b, out["velocity_time"]),
    ]
    for i, (ref, ours) in enumerate(pairs):
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), atol=2e-5, rtol=1e-4,
            err_msg=f"output {i} diverged",
        )


def test_beat_converter_parity(_no_grad):
    import jax.numpy as jnp
    from etude.models.beat_transformer import Demixed_DilatedTransformerModel

    from etude_tpu.models.beat_transformer import (
        BeatTransformerConfig,
        forward,
    )
    from etude_tpu.utils.torch_port import convert_beat_state_dict

    cfg = BeatTransformerConfig(
        attn_len=5, instr=3, ntoken=2, dmodel=32, nhead=8, d_hid=64,
        nlayers=6, mel_bins=128, n_tempi=300, instr_layers=(3, 4, 5),
        compat_head7_bug=True,  # the reference trains with the bug
    )
    torch.manual_seed(0)
    model = Demixed_DilatedTransformerModel(
        attn_len=cfg.attn_len, instr=cfg.instr, ntoken=cfg.ntoken,
        dmodel=cfg.dmodel, nhead=cfg.nhead, d_hid=cfg.d_hid,
        nlayers=cfg.nlayers, norm_first=True, dropout=0.0,
    ).eval()

    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, cfg.instr, 24, cfg.mel_bins)).astype(np.float32)

    act_ref, tempo_ref = model(torch.from_numpy(x))

    params = convert_beat_state_dict(model.state_dict(), cfg)
    act, tempo = forward(params, cfg, jnp.asarray(x), compute_dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(act), act_ref.numpy(), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tempo), tempo_ref.numpy(), atol=3e-5, rtol=1e-4
    )


def test_hft_pickle_roundtrip(tmp_path, _no_grad):
    """A pickled-whole-model file (the reference's latest.pkl format) loads
    through the stub unpickler and converts identically to the state dict."""
    import pickle

    from etude.models.amt_apc import (
        Decoder_SPEC2MIDI,
        Encoder_SPEC2MIDI,
        Model_SPEC2MIDI,
    )

    from etude_tpu.models.amt import AMTConfig
    from etude_tpu.utils.torch_port import (
        convert_amt_state_dict,
        load_torch_amt_checkpoint,
    )

    cfg = AMTConfig(
        n_margin=2, n_frame=8, n_bin=16, cnn_channel=2, cnn_kernel=3,
        hid_dim=16, encoder_n_layer=1, encoder_n_head=2,
        decoder_n_layer=2, decoder_n_head=2, pf_dim=32,
        n_note=6, n_velocity=4,
    )
    torch.manual_seed(3)
    enc = Encoder_SPEC2MIDI(cfg.n_margin, cfg.n_frame, cfg.n_bin,
                            cfg.cnn_channel, cfg.cnn_kernel, cfg.hid_dim,
                            cfg.encoder_n_layer, cfg.encoder_n_head,
                            cfg.pf_dim, 0.0, "cpu")
    dec = Decoder_SPEC2MIDI(cfg.n_frame, cfg.n_bin, cfg.n_note,
                            cfg.n_velocity, cfg.hid_dim, cfg.decoder_n_layer,
                            cfg.decoder_n_head, cfg.pf_dim, 0.0, "cpu")
    model = Model_SPEC2MIDI(enc, dec)

    pkl = tmp_path / "latest.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(model, f)

    # Simulate the legacy-class-path problem: hide the module so the stub
    # unpickler path is exercised.
    import jax

    hidden = {k: sys.modules.pop(k) for k in list(sys.modules)
              if k.startswith("etude.")}
    try:
        params_pkl = load_torch_amt_checkpoint(pkl, cfg)
    finally:
        sys.modules.update(hidden)

    params_sd = convert_amt_state_dict(model.state_dict(), cfg)
    for a, b in zip(jax.tree.leaves(params_pkl), jax.tree.leaves(params_sd)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hft_pickle_torch_save_formats(tmp_path, _no_grad):
    """Whole-model files written by torch.save (zip archive and pre-1.6
    legacy stream) also load through the stub unpickler — a user holding
    any latest.pkl vintage has a path in (reference CustomUnpickler only
    handles the raw-pickle case, etude/models/hft_transformer.py:26-33)."""
    import types

    from etude_tpu.utils.torch_port import load_hft_pickle_state_dict

    mod = types.ModuleType("model_fake_hft")

    class Enc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(4, 3)
            self.register_buffer("scale_freq", torch.tensor(2.0))

    class Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_spec2midi = Enc()
            self.emb = torch.nn.Embedding(5, 4)

    Enc.__module__ = Wrap.__module__ = "model_fake_hft"
    Enc.__qualname__, Wrap.__qualname__ = "Enc", "Wrap"
    mod.Enc, mod.Wrap = Enc, Wrap
    sys.modules["model_fake_hft"] = mod
    try:
        model = Wrap()
        ref_sd = {k: v.clone() for k, v in model.state_dict().items()}
        zip_f = tmp_path / "zip.pkl"
        legacy_f = tmp_path / "legacy.pkl"
        torch.save(model, zip_f)
        torch.save(model, legacy_f, _use_new_zipfile_serialization=False)
    finally:
        del sys.modules["model_fake_hft"]

    for path in (zip_f, legacy_f):
        sd = load_hft_pickle_state_dict(path)
        assert set(sd) == set(ref_sd)
        for k in ref_sd:
            assert torch.equal(sd[k], ref_sd[k]), k
