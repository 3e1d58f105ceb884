"""Native C++ BPE tokenizer: build, parity with the Python BPE, and with HF."""
import json

import numpy as np
import pytest

from prcv2025reid_tpu.data.tokenizer import ClipBPETokenizer, _bytes_to_unicode


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("vocab")
    base = list(_bytes_to_unicode().values())
    vocab = {tok: i for i, tok in enumerate(base + [t + "</w>" for t in base])}
    merges = [
        "h e", "he l", "hel l", "hell o</w>",
        "w o", "wo r", "wor l", "worl d</w>",
        "t h", "th e</w>",
        "i n", "in g</w>",
        "e r</w>",
    ]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version\n" + "\n".join(merges) + "\n")
    return str(tmp_path)


@pytest.fixture(scope="module")
def native_tok(vocab_dir):
    from prcv2025reid_tpu.data.native_tokenizer import (
        NativeClipBPETokenizer,
        build_library,
    )

    if build_library() is None:
        pytest.skip("g++ unavailable")
    return NativeClipBPETokenizer(vocab_dir, context_length=16)


TEXTS = [
    "hello world",
    "the runner ering",
    "Hello,   WORLD!!",
    "it's working 4 u",
    "a-b c_d 1 2 3",
    "",
    "hellohello worldworld thething",
]


class TestNativeBPE:
    def test_parity_with_python(self, vocab_dir, native_tok):
        py = ClipBPETokenizer(vocab_dir, context_length=16)
        for text in TEXTS:
            np.testing.assert_array_equal(
                native_tok([text]), py([text]), err_msg=f"text={text!r}"
            )

    def test_parity_with_hf(self, vocab_dir, native_tok):
        transformers = pytest.importorskip("transformers")
        theirs = transformers.CLIPTokenizer(
            vocab_dir + "/vocab.json", vocab_dir + "/merges.txt"
        )
        for text in TEXTS:
            want = theirs(text, padding="max_length", max_length=16, truncation=True)[
                "input_ids"
            ]
            got = native_tok([text])[0]
            n = want.index(theirs.eos_token_id) + 1
            assert got[:n].tolist() == want[:n], f"text={text!r}"

    def test_build_tokenizer_prefers_native(self, vocab_dir):
        from prcv2025reid_tpu.data.native_tokenizer import NativeClipBPETokenizer
        from prcv2025reid_tpu.data.tokenizer import CachedTokenizer, build_tokenizer

        tok = build_tokenizer(vocab_dir, context_length=16)
        assert isinstance(tok, CachedTokenizer)
        assert isinstance(tok.inner, NativeClipBPETokenizer)

    def test_throughput_exceeds_python(self, vocab_dir, native_tok):
        import time

        py = ClipBPETokenizer(vocab_dir, context_length=16)
        texts = [f"hello world the thing {i}" for i in range(2000)]
        t0 = time.perf_counter()
        native_tok(texts)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        py(texts)
        t_py = time.perf_counter() - t0
        # the native path must not be slower (usually ~5-20x faster)
        assert t_native <= t_py * 1.5, (t_native, t_py)
