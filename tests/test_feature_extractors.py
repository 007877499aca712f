"""Mock-level tests of the offline feature extractors
(preprocess.py:t5_text_features / resnet50_image_features; reference:
dataset_process/foodcom_process.ipynb cells 9-17).

No network / pretrained weights: a fake tokenizer+encoder / backbone is
injected and the pooling, batching, dtype, and output-shape contract is
verified ((N, 512)-style text, (N, 2048)-style image).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class FakeTokenizer:
    """Deterministic 'tokenizer': token ids = character codes, padded."""

    def __call__(self, texts, return_tensors=None, padding=True,
                 truncation=True):
        seqs = [[ord(c) % 97 + 1 for c in t][:16] or [1] for t in texts]
        L = max(len(s) for s in seqs)
        ids = torch.zeros((len(seqs), L), dtype=torch.long)
        mask = torch.zeros((len(seqs), L), dtype=torch.long)
        for r, s in enumerate(seqs):
            ids[r, :len(s)] = torch.tensor(s)
            mask[r, :len(s)] = 1
        return {"input_ids": ids, "attention_mask": mask}


class FakeEncoder(torch.nn.Module):
    """last_hidden_state[b, t, :] = f(input_ids[b, t]) so the expected
    mask-weighted mean is computable by hand."""

    def __init__(self, hidden=512):
        super().__init__()
        self.hidden = hidden

    def forward(self, input_ids=None, attention_mask=None):
        b, L = input_ids.shape
        base = input_ids.float()[..., None]            # [B, L, 1]
        scale = torch.arange(1, self.hidden + 1).float() / self.hidden
        out = type("O", (), {})()
        out.last_hidden_state = base * scale            # [B, L, H]
        return out


def test_t5_pooling_batching_shape_dtype():
    from foodrec_tpu.data.preprocess import t5_text_features

    texts = [f"recipe number {i}" for i in range(7)]  # 7 % batch_size != 0
    feats = t5_text_features(texts, batch_size=3,
                             tokenizer=FakeTokenizer(),
                             encoder=FakeEncoder(hidden=512))
    assert feats.shape == (7, 512)
    assert feats.dtype == np.float32

    # hand-computed mask-weighted mean for row 0
    tok = FakeTokenizer()(texts[:1])
    ids = tok["input_ids"].float()[0]
    mask = tok["attention_mask"][0].bool()
    mean_id = ids[mask].mean().item()
    scale = np.arange(1, 513) / 512.0
    np.testing.assert_allclose(feats[0], mean_id * scale, rtol=1e-5)

    # batching must not change results
    feats1 = t5_text_features(texts, batch_size=100,
                              tokenizer=FakeTokenizer(),
                              encoder=FakeEncoder(hidden=512))
    np.testing.assert_allclose(feats, feats1, rtol=1e-6)


class FakeBackbone(torch.nn.Module):
    """Output row = [mean(pixels), 0, 1, 2, ...] -> width 2048."""

    def forward(self, x):
        b = x.shape[0]
        head = x.reshape(b, -1).mean(dim=1, keepdim=True)    # [B, 1]
        tail = torch.arange(2047).float().expand(b, -1)
        return torch.cat([head, tail], dim=1)                # [B, 2048]


def _write_images(tmp_path, n):
    from PIL import Image

    paths = []
    for i in range(n):
        arr = np.full((8, 8, 3), i * 10, dtype=np.uint8)
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def test_resnet_batching_shape_dtype(tmp_path):
    from foodrec_tpu.data.preprocess import resnet50_image_features

    paths = _write_images(tmp_path, 5)  # 5 % batch_size != 0
    ident = lambda img: torch.as_tensor(
        np.asarray(img, dtype=np.float32) / 255.0).permute(2, 0, 1)
    feats = resnet50_image_features(paths, batch_size=2,
                                    backbone=FakeBackbone(), transform=ident)
    assert feats.shape == (5, 2048)
    assert feats.dtype == np.float32
    # rows ordered like the input paths: mean pixel grows with i*10/255
    assert np.all(np.diff(feats[:, 0]) > 0)
    # batching must not change results
    feats1 = resnet50_image_features(paths, batch_size=64,
                                     backbone=FakeBackbone(), transform=ident)
    np.testing.assert_allclose(feats, feats1, rtol=1e-6)


def test_resnet_default_transform_shape(tmp_path):
    """The default torchvision transform pipeline (resize 256 / crop 224 /
    normalize) feeds [B, 3, 224, 224] into the backbone."""
    torchvision = pytest.importorskip("torchvision")  # noqa: F841
    from foodrec_tpu.data.preprocess import resnet50_image_features

    seen = {}

    class ShapeSpy(torch.nn.Module):
        def forward(self, x):
            seen["shape"] = tuple(x.shape)
            return torch.zeros((x.shape[0], 2048))

    paths = _write_images(tmp_path, 2)
    feats = resnet50_image_features(paths, backbone=ShapeSpy())
    assert seen["shape"] == (2, 3, 224, 224)
    assert feats.shape == (2, 2048)
