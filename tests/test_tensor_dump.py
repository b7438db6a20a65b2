"""--debug-tensor-dump: per-layer activation npz for cross-impl diffing
(reference --debug-tensor-dump-* flags, server_args.py:228-230 +
distributed/model_tensor_tracer.py:20)."""

import numpy as np

from tests.utils import TINY_LLAMA_CFG, tiny_engine


def _dump(tmp_path, name, seed):
    e = tiny_engine(random_seed=seed)
    path = e.debug_tensor_dump(
        input_ids=[5, 9, 23, 77, 41, 2],
        out_folder=str(tmp_path / name),
    )
    return dict(np.load(path))


def test_same_seed_dumps_identical(tmp_path):
    a = _dump(tmp_path, "a", seed=7)
    b = _dump(tmp_path, "b", seed=7)
    L = TINY_LLAMA_CFG["num_hidden_layers"]
    # one entry per layer + input/final/logits
    assert len([k for k in a if k.startswith("layer_")]) == L
    for k in a:
        assert k in b
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-5,
                                   err_msg=k)


def test_different_weights_dumps_differ(tmp_path):
    a = _dump(tmp_path, "a", seed=7)
    c = _dump(tmp_path, "c", seed=8)
    assert not np.allclose(a["logits"], c["logits"])
    assert not np.allclose(a["final_hidden"], c["final_hidden"])


def test_dump_flag_runs_at_init(tmp_path):
    import os

    e = tiny_engine(
        debug_tensor_dump_output_folder=str(tmp_path / "auto"),
    )
    assert os.path.exists(tmp_path / "auto" / "tensor_dump.npz")
    d = dict(np.load(tmp_path / "auto" / "tensor_dump.npz"))
    assert "logits" in d and "input_ids" in d
    assert d["logits"].shape[0] == len(d["input_ids"])
