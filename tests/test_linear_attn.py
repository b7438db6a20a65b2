"""Gated DeltaNet op vs the HF torch reference implementations
(modeling_qwen3_next torch_chunk_gated_delta_rule /
torch_recurrent_gated_delta_rule / torch_causal_conv1d_update)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sglang_fluentllm_tpu.ops.linear_attn import (  # noqa: E402
    causal_conv1d,
    gated_delta_rule,
)

B, S, H, DK, DV = 2, 96, 3, 16, 24


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def make_inputs(rng, s=S):
    q = _rand(rng, B, s, H, DK)
    k = _rand(rng, B, s, H, DK)
    v = _rand(rng, B, s, H, DV)
    g = -np.abs(_rand(rng, B, s, H)) * 0.3
    beta = 1 / (1 + np.exp(-_rand(rng, B, s, H)))
    return q, k, v, g, beta


def hf_chunk(q, k, v, g, beta, initial_state=None):
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_chunk_gated_delta_rule,
    )

    out, st = torch_chunk_gated_delta_rule(
        *map(torch.tensor, (q, k, v, g, beta)),
        initial_state=None if initial_state is None
        else torch.tensor(initial_state),
        output_final_state=True, use_qk_l2norm_in_kernel=True,
    )
    return out.numpy(), st.numpy()


def hf_recurrent(q, k, v, g, beta, initial_state=None):
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_recurrent_gated_delta_rule,
    )

    out, st = torch_recurrent_gated_delta_rule(
        *map(torch.tensor, (q, k, v, g, beta)),
        initial_state=None if initial_state is None
        else torch.tensor(initial_state),
        output_final_state=True, use_qk_l2norm_in_kernel=True,
    )
    return out.numpy(), st.numpy()


class TestDeltaRule:
    def test_prefill_matches_hf_chunk(self):
        rng = np.random.RandomState(0)
        q, k, v, g, beta = make_inputs(rng)
        zero = np.zeros((B, H, DK, DV), np.float32)
        out, st = gated_delta_rule(q, k, v, g, beta, zero)
        ref_out, ref_st = hf_chunk(q, k, v, g, beta)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(st), ref_st,
                                   rtol=2e-4, atol=2e-4)

    def test_non_chunk_multiple_length(self):
        rng = np.random.RandomState(1)
        q, k, v, g, beta = make_inputs(rng, s=37)
        zero = np.zeros((B, H, DK, DV), np.float32)
        out, st = gated_delta_rule(q, k, v, g, beta, zero)
        ref_out, ref_st = hf_recurrent(q, k, v, g, beta)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(st), ref_st,
                                   rtol=2e-4, atol=2e-4)

    def test_decode_step_matches_hf(self):
        rng = np.random.RandomState(2)
        q, k, v, g, beta = make_inputs(rng, s=1)
        st0 = _rand(rng, B, H, DK, DV) * 0.1
        out, st = gated_delta_rule(q, k, v, g, beta, st0)
        ref_out, ref_st = hf_recurrent(q, k, v, g, beta, st0)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(st), ref_st,
                                   rtol=1e-5, atol=1e-5)

    def test_state_continuation(self):
        """prefill(first half) then prefill(second half, carried state)
        == one full prefill."""
        rng = np.random.RandomState(3)
        q, k, v, g, beta = make_inputs(rng)
        zero = np.zeros((B, H, DK, DV), np.float32)
        out_full, st_full = gated_delta_rule(q, k, v, g, beta, zero)
        h = S // 2
        _, st1 = gated_delta_rule(
            q[:, :h], k[:, :h], v[:, :h], g[:, :h], beta[:, :h], zero)
        out2, st2 = gated_delta_rule(
            q[:, h:], k[:, h:], v[:, h:], g[:, h:], beta[:, h:],
            np.asarray(st1))
        np.testing.assert_allclose(np.asarray(st2), np.asarray(st_full),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out2), np.asarray(out_full)[:, h:],
            rtol=2e-4, atol=2e-4)

    def test_ragged_q_len(self):
        """A row padded beyond q_len must produce the same final state as
        the exact-length run."""
        rng = np.random.RandomState(4)
        q, k, v, g, beta = make_inputs(rng)
        zero = np.zeros((B, H, DK, DV), np.float32)
        q_len = np.asarray([S, 40], np.int32)
        out, st = gated_delta_rule(q, k, v, g, beta, zero, q_len=q_len)
        _, st_row1 = gated_delta_rule(
            q[1:, :40], k[1:, :40], v[1:, :40], g[1:, :40],
            beta[1:, :40], zero[1:])
        np.testing.assert_allclose(np.asarray(st)[1], np.asarray(st_row1)[0],
                                   rtol=2e-4, atol=2e-4)
        # row 0 (full) unaffected by masking
        _, st_row0 = gated_delta_rule(q[:1], k[:1], v[:1], g[:1],
                                      beta[:1], zero[:1])
        np.testing.assert_allclose(np.asarray(st)[0], np.asarray(st_row0)[0],
                                   rtol=2e-4, atol=2e-4)


class TestConv:
    def test_decode_update_matches_hf(self):
        from transformers.models.qwen3_next.modeling_qwen3_next import (
            torch_causal_conv1d_update,
        )

        rng = np.random.RandomState(5)
        C, K = 12, 4
        x = _rand(rng, B, 1, C)
        state = _rand(rng, B, C, K)
        w = _rand(rng, C, K)
        q_len = np.ones((B,), np.int32)
        out, new_state = causal_conv1d(x, state, w, q_len)
        st_t = torch.tensor(state.copy())
        ref = torch_causal_conv1d_update(
            torch.tensor(x).transpose(1, 2), st_t, torch.tensor(w),
            activation="silu",
        )
        np.testing.assert_allclose(
            np.asarray(out), ref.transpose(1, 2).numpy(),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state), st_t.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_prefill_from_zero_matches_padded_conv(self):
        """Zero state + our conv == HF prefill conv (left zero padding)."""
        rng = np.random.RandomState(6)
        C, K, s = 8, 4, 10
        x = _rand(rng, B, s, C)
        w = _rand(rng, C, K)
        state = np.zeros((B, C, K), np.float32)
        q_len = np.full((B,), s, np.int32)
        out, new_state = causal_conv1d(x, state, w, q_len)
        xt = torch.tensor(x).transpose(1, 2)
        conv = torch.nn.functional.conv1d(
            xt, torch.tensor(w).unsqueeze(1), padding=K - 1, groups=C
        )[:, :, :s]
        ref = torch.nn.functional.silu(conv).transpose(1, 2).numpy()
        np.testing.assert_allclose(np.asarray(out), ref,
                                   rtol=1e-5, atol=1e-5)
        # state holds the last K inputs
        np.testing.assert_allclose(
            np.asarray(new_state), x[:, s - 4:].swapaxes(1, 2),
            rtol=1e-6, atol=1e-6)

    def test_chunked_conv_continuation(self):
        rng = np.random.RandomState(7)
        C, K, s = 8, 4, 12
        x = _rand(rng, B, s, C)
        w = _rand(rng, C, K)
        zeros = np.zeros((B, C, K), np.float32)
        full_out, full_state = causal_conv1d(
            x, zeros, w, np.full((B,), s, np.int32))
        h = 5
        out1, st1 = causal_conv1d(
            x[:, :h], zeros, w, np.full((B,), h, np.int32))
        out2, st2 = causal_conv1d(
            x[:, h:], np.asarray(st1), w, np.full((B,), s - h, np.int32))
        np.testing.assert_allclose(
            np.concatenate([np.asarray(out1), np.asarray(out2)], 1),
            np.asarray(full_out), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(st2), np.asarray(full_state),
                                   rtol=1e-5, atol=1e-5)


class TestPallasGdnKernel:
    def test_interpret_matches_xla_scan(self):
        """The Pallas chunk-scan kernel (interpret mode) reproduces the
        XLA lax.scan path bit-for-bit-ish on a long ragged batch."""
        import os

        import numpy as np

        from sglang_fluentllm_tpu.ops import linear_attn as la

        rng = np.random.RandomState(5)
        B, S, H, D = 2, 200, 2, 128
        q = rng.standard_normal((B, S, H, D)).astype(np.float32)
        k = rng.standard_normal((B, S, H, D)).astype(np.float32)
        v = rng.standard_normal((B, S, H, D)).astype(np.float32)
        g = -np.abs(rng.standard_normal((B, S, H))).astype(np.float32)
        beta = rng.uniform(0.2, 0.9, (B, S, H)).astype(np.float32)
        st = np.zeros((B, H, D, D), np.float32)
        qlen = np.asarray([200, 130], np.int32)

        saved = os.environ.get("SFT_GDN_PALLAS")
        try:
            os.environ["SFT_GDN_PALLAS"] = "off"
            o1, s1 = la.gated_delta_rule(q, k, v, g, beta, st, qlen)
            os.environ["SFT_GDN_PALLAS"] = "interpret"
            o2, s2 = la.gated_delta_rule(q, k, v, g, beta, st, qlen)
        finally:
            if saved is None:
                os.environ.pop("SFT_GDN_PALLAS", None)
            else:
                os.environ["SFT_GDN_PALLAS"] = saved
        np.testing.assert_allclose(
            np.asarray(o1), np.asarray(o2), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), rtol=2e-4, atol=2e-4)
