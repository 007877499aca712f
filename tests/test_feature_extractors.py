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


def test_t5_real_classes_random_init():
    """Real transformers classes end-to-end (VERDICT r2 #39 residual risk:
    'the transformers/torchvision load path only'). No network: the encoder
    is a real `T5EncoderModel` randomly initialized from a small `T5Config`,
    the tokenizer a real `T5TokenizerFast` wrapping a Unigram model trained
    in-process — so the extractor runs the genuine tokenize→encode→pool
    path (real padding, real attention masks), only the weight VALUES
    differ from t5-small. Pretrained-weight execution itself needs egress
    and stays a documented caveat."""
    transformers = pytest.importorskip("transformers")
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    from foodrec_tpu.data.preprocess import t5_text_features

    corpus = ["chicken soup with rice", "chocolate lava cake",
              "garlic butter shrimp pasta", "kale quinoa salad bowl"]
    tok = Tokenizer(models.Unigram())
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.train_from_iterator(
        corpus * 20,
        trainers.UnigramTrainer(vocab_size=200, unk_token="<unk>",
                                special_tokens=["<pad>", "</s>", "<unk>"]))
    t5_tok = transformers.T5TokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", eos_token="</s>",
        unk_token="<unk>", model_max_length=20)
    torch.manual_seed(0)
    cfg = transformers.T5Config(vocab_size=t5_tok.vocab_size + 10,
                                d_model=64, d_ff=128, num_layers=2,
                                num_heads=4, d_kv=16)
    enc = transformers.T5EncoderModel(cfg).eval()

    texts = corpus + ["beef stew", "a very long recipe title " * 4]  # 6 % 4 != 0
    feats = t5_text_features(texts, batch_size=4, tokenizer=t5_tok,
                             encoder=enc)
    assert feats.shape == (6, 64)
    assert feats.dtype == np.float32
    assert np.all(np.isfinite(feats))

    # mask-weighted mean pooling must make rows independent of batch
    # composition: per-batch padding lengths differ between these two
    # calls, so any mask bug would change the pooled values.
    feats1 = t5_text_features(texts, batch_size=1, tokenizer=t5_tok,
                              encoder=enc)
    np.testing.assert_allclose(feats, feats1, rtol=2e-5, atol=2e-6)

    # row 0 == direct single-text encode + hand pooling
    b = t5_tok(texts[:1], return_tensors="pt", padding=True, truncation=True)
    with torch.no_grad():
        h = enc(**b).last_hidden_state[0]
    np.testing.assert_allclose(feats[0], h.mean(0).numpy(), rtol=2e-5,
                               atol=2e-6)


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
