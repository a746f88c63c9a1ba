"""Tool-calling agent protocol (reference agent_core.py): one tool per turn,
mask lifecycle, duplicate-prompt rejection, per-mask verdicts, pruning."""

import json

import numpy as np
import pytest

from sam3_lora_tpu.agent_tools import (
    ScriptedLLM,
    parse_tool_call,
    tool_agent_inference,
)
from sam3_lora_tpu.config import tiny_model_config
from sam3_lora_tpu.processor import Sam3Processor

pytestmark = pytest.mark.fast


def _tool(name, **params):
    return f'<tool>{json.dumps({"name": name, "parameters": params})}</tool>'


def test_parse_tool_call_cleans_stray_brace():
    c = parse_tool_call(
        'thinking...\n<tool>{"name": "segment_phrase", '
        '"parameters": {"text_prompt": "dog"}}}</tool>trailing'
    )
    assert c.name == "segment_phrase"
    assert c.parameters == {"text_prompt": "dog"}


def test_parse_tool_call_requires_tag():
    with pytest.raises(ValueError):
        parse_tool_call("no tool call here")


@pytest.fixture(scope="module")
def proc():
    return Sam3Processor(model_cfg=tiny_model_config(), threshold=0.0)


@pytest.fixture(scope="module")
def img():
    return (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)


def test_report_no_mask_flow(proc, img):
    llm = ScriptedLLM(
        [
            _tool("segment_phrase", text_prompt="unicorn"),
            _tool("segment_phrase", text_prompt="animal"),
            _tool("report_no_mask"),
        ]
    )
    res = tool_agent_inference(
        proc, img, "the unicorn", llm, threshold=5.0
    )  # threshold 5.0 -> deterministic zero detections
    assert res.no_mask and res.masks == []
    assert res.used_prompts == ["unicorn", "animal"]
    # prompt-exhaustion warning folded into the pruned preamble
    joined = " ".join(str(m.get("content")) for m in res.transcript)
    assert "unicorn" in joined


def test_select_flow_returns_chosen_masks(proc, img):
    llm = ScriptedLLM(
        [
            _tool("segment_phrase", text_prompt="square"),
            _tool("select_masks_and_return", final_answer_masks=[1, 3, 3, 99]),
        ]
    )
    res = tool_agent_inference(proc, img, "the square", llm, threshold=-10.0)
    assert not res.no_mask
    # dedup + drop invalid 99 -> masks 1 and 3
    assert len(res.masks) == 2 and len(res.boxes) == 2 and len(res.scores) == 2
    h, w = img.shape[:2]
    assert res.masks[0].shape == (h, w) and res.masks[0].dtype == bool


def test_duplicate_prompt_rejected(proc, img):
    llm = ScriptedLLM(
        [
            _tool("segment_phrase", text_prompt="thing"),
            _tool("segment_phrase", text_prompt="thing"),  # duplicate
            _tool("select_masks_and_return", final_answer_masks=[1]),
        ]
    )
    res = tool_agent_inference(proc, img, "thing", llm, threshold=-10.0)
    assert res.used_prompts == ["thing"]  # second call did not re-ground
    corrective = [
        m
        for m in res.transcript
        if m["role"] == "user" and "may not be reused" in str(m["content"])
    ]
    assert corrective, "duplicate prompt must trigger a corrective message"
    assert len(res.masks) == 1


def test_examine_each_mask_filters(proc, img):
    # ground everything (threshold -10 keeps all query slots), then the
    # checker accepts only the first two masks, then select both survivors
    out = proc.set_image(img).set_text_prompt("x", threshold=-10.0)
    n = out["num_detections"]
    assert n >= 3
    verdicts = ["ok <verdict>Accept</verdict>"] * 2 + [
        "bad <verdict>Reject</verdict>"
    ] * (n - 2)
    llm = ScriptedLLM(
        [
            _tool("segment_phrase", text_prompt="blob"),
            _tool("examine_each_mask"),
        ]
        + verdicts
        + [_tool("select_masks_and_return", final_answer_masks=[1, 2])]
    )
    res = tool_agent_inference(proc, img, "blob", llm, threshold=-10.0,
                               max_generations=n + 5)
    assert len(res.masks) == 2
    assert not res.no_mask


def test_first_call_must_ground(proc, img):
    llm = ScriptedLLM([_tool("select_masks_and_return", final_answer_masks=[1])])
    with pytest.raises(ValueError):
        tool_agent_inference(proc, img, "q", llm)


def test_prompt_corpus_loads_and_drives_the_loop(proc, img):
    """The corpus (assets/agent_prompts/, the reference system_prompts/
    analogue) must load, document every tool, and be usable as the live
    system prompt."""
    from sam3_lora_tpu.agent_tools import load_system_prompt

    agent = load_system_prompt("grounding_agent")
    for tool in (
        "segment_phrase",
        "examine_each_mask",
        "select_masks_and_return",
        "report_no_mask",
    ):
        assert tool in agent
    check = load_system_prompt("mask_check")
    assert "<verdict>Accept</verdict>" in check
    with pytest.raises(FileNotFoundError):
        load_system_prompt("nonsense")

    llm = ScriptedLLM(
        [
            _tool("segment_phrase", text_prompt="object"),
            _tool("select_masks_and_return", final_answer_masks=[1]),
        ]
    )
    res = tool_agent_inference(
        proc, img, "q", llm, threshold=-10.0, system_prompt=agent,
        check_system_prompt=check,
    )
    assert not res.no_mask


def test_budget_exhaustion_returns_current(proc, img):
    llm = ScriptedLLM(
        [
            _tool("segment_phrase", text_prompt="a"),
            _tool("segment_phrase", text_prompt="b"),
            _tool("segment_phrase", text_prompt="c"),
        ]
    )
    res = tool_agent_inference(proc, img, "q", llm, threshold=-10.0, max_generations=2)
    assert res.rounds == 2
    assert len(res.masks) > 0  # keeps the latest grounding
