import numpy as np
import pytest


def test_audio_feature_stage(ray_session):
    import ray.data as rd

    from pytorchocr_ray.stages.multimodal import audio_features
    from pytorchocr_ray.synth.multimodal import synth_audio_table

    t = synth_audio_table(10, seed=1)
    ds = rd.from_arrow(t)
    out = audio_features(ds, concurrency=2).to_pandas()
    assert set(out.columns) == {"sample_ref", "window_idx", "energy", "zcr"}
    assert out["sample_ref"].nunique() == 10
    # window counts match 1 + (n - window)//hop
    n0 = int(t.to_pandas().set_index("sample_ref").loc["aud-000000", "n_samples"])
    expect = 1 + (n0 - 1024) // 512
    assert (out["sample_ref"] == "aud-000000").sum() == expect
    assert (out["energy"] > 0).all() and out["zcr"].between(0, 1).all()


def test_audio_features_deterministic(ray_session):
    import ray.data as rd

    from pytorchocr_ray.stages.multimodal import audio_features
    from pytorchocr_ray.synth.multimodal import synth_audio_table

    t = synth_audio_table(5, seed=2)
    a = audio_features(rd.from_arrow(t), concurrency=2).to_pandas()
    b = audio_features(rd.from_arrow(t), concurrency=1, batch_size=3).to_pandas()
    key = ["sample_ref", "window_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a["sample_ref"].tolist() == b["sample_ref"].tolist()
    np.testing.assert_array_equal(a["energy"].to_numpy(), b["energy"].to_numpy())
    np.testing.assert_array_equal(a["zcr"].to_numpy(), b["zcr"].to_numpy())


def test_video_frame_sample_stage(ray_session):
    import ray.data as rd

    from pytorchocr_ray.stages.multimodal import video_frame_samples
    from pytorchocr_ray.synth.multimodal import synth_video_table

    t = synth_video_table(6, seed=3)
    out = video_frame_samples(rd.from_arrow(t), concurrency=2, every_k=5).to_pandas()
    meta = t.to_pandas().set_index("frame_ref")
    for ref, g in out.groupby("frame_ref"):
        n = int(meta.loc[ref, "n_frames"])
        assert sorted(g["frame_idx"]) == list(range(0, n, 5))
    assert (out["mean_luma"] > 0).all() and (out["mean_luma"] < 255).all()


def test_stub_decoder_raises_on_empty_payload():
    from pytorchocr_ray.stages.multimodal import fake_audio_decode, fake_video_decode

    with pytest.raises(NotImplementedError):
        fake_audio_decode(b"", 100, 16000)
    with pytest.raises(NotImplementedError):
        fake_video_decode(b"", 10, 8, 8)


def test_label_encode_and_structure_decode():
    import numpy as np

    from pytorchocr_ray.functions.ctc import ctc_label_encode, structure_greedy_decode

    out = ctc_label_encode("ab1")
    assert out is not None
    idxs, n = out
    assert n == 3 and len(idxs) == 25 and idxs[3] == 0
    assert ctc_label_encode("") is None
    assert ctc_label_encode("x" * 26) is None
    assert ctc_label_encode("???") is None  # unknown chars skipped -> empty

    vocab = ["<html>", "<tr>", "<td>", "</td>", "</tr>", "</html>"]
    probs = np.eye(6, dtype=np.float32)[[1, 2, 3, 5, 4]]
    assert structure_greedy_decode(probs, vocab) == ["<tr>", "<td>", "</td>"]
