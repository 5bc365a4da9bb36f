"""Deterministic fake generation backend for the env-gated LLM adapter test
(resolved via ETL_LLM_GENERATE='tests.fake_llm:generate'). Parses the JSON
list out of the adapter's prompt and answers in the reference's fenced-JSON
reply shape (main.py:207-210)."""

from __future__ import annotations

import json


def generate(prompt: str) -> str:
    texts = json.loads(prompt[prompt.index("Input List:") + len("Input List:"):])
    reply = {
        t: {
            "active_ingredient": t.split()[0].upper() if t.split() else "",
            "trade_name": t.split()[1] if len(t.split()) > 1 else "",
        }
        for t in texts
    }
    return "```json\n" + json.dumps(reply, ensure_ascii=False) + "\n```"
