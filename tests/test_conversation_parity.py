"""Conversation templates must byte-match the reference's get_prompt output
(reference: timeviper/data/conversation.py:28-72, 203-228) — converted
checkpoints see identical token streams only if the strings are identical."""

from timeviper_tpu.data.conversation import CONV_NANO, CONV_QWEN2


def test_nano_single_turn_generation_prompt():
    # reference NANO style: system -> "<SPECIAL_10>System\n<SPECIAL_12>\n",
    # user turn "<SPECIAL_11>User\n{msg}\n<SPECIAL_12>", open assistant turn
    # "<SPECIAL_11>Assistant\n"
    got = CONV_NANO.prompt_for_generation("hello")
    expected = (
        "<SPECIAL_10>System\n<SPECIAL_12>\n"
        "<SPECIAL_11>User\nhello\n<SPECIAL_12>"
        "<SPECIAL_11>Assistant\n"
    )
    assert got == expected, repr(got)


def test_nano_full_turn():
    got = CONV_NANO.render([("user", "q"), ("assistant", "a")])
    expected = (
        "<SPECIAL_10>System\n<SPECIAL_12>\n"
        "<SPECIAL_11>User\nq\n<SPECIAL_12>"
        "<SPECIAL_11>Assistant\na\n<SPECIAL_12>"
    )
    assert got == expected, repr(got)


def test_qwen2_generation_prompt():
    # reference QWEN2 style (conversation.py:41-52): system + sep + "\n",
    # each turn "role + message + sep (+\n unless last)", open role bare
    got = CONV_QWEN2.prompt_for_generation("hello")
    expected = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nhello<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    assert got == expected, repr(got)


def test_qwen2_full_turn_last_has_no_trailing_newline():
    got = CONV_QWEN2.render([("user", "q"), ("assistant", "a")])
    expected = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nq<|im_end|>\n"
        "<|im_start|>assistant\na<|im_end|>"
    )
    assert got == expected, repr(got)


import importlib.util
import os

import pytest


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not mounted")
def test_against_live_reference_templates():
    spec = importlib.util.spec_from_file_location(
        "ref_conv", "/root/reference/timeviper/data/conversation.py")
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)

    for name, ours in (("nano_base", CONV_NANO), ("qwen2", CONV_QWEN2)):
        ref = rc.conv_templates[name].copy()
        ref.messages = []
        ref.append_message(ref.roles[0], "hello there")
        ref.append_message(ref.roles[1], None)
        assert ours.prompt_for_generation("hello there") == ref.get_prompt(), name

        ref2 = rc.conv_templates[name].copy()
        ref2.messages = []
        ref2.append_message(ref2.roles[0], "q")
        ref2.append_message(ref2.roles[1], "a")
        assert ours.render([("user", "q"), ("assistant", "a")]) == ref2.get_prompt(), name
