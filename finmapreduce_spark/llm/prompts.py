"""S12/F15 — prompt-set source and template formatting.

Reference: prompt sets are YAML files resolved by format name
(document_processing.py:562-598, config/prompts/prompt_config.yml:1-34)
into LangChain PromptTemplates; formatting is ``template.format(**kw)``
(async_llm_client.py:438-454). Template TEXT here is original — the
engine's correctness never depends on prompt wording (the mock LLM is
a pure function of the whole prompt string).

Spark posture: a prompt set is driver-side config, broadcast
implicitly by closure capture into the LLM UDFs — it is NOT data.
Column-level formatting (building per-row prompts from columns)
uses ``F.format_string``, which stays inside whole-stage codegen;
``render_prompt`` is the in-UDF scalar twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# %s slots: question, payload (chunk text / gathered map results / doc)
_SETS: dict[str, dict[str, str]] = {
    "json": {
        "map": "Answer as JSON with summary/terms/evidence/answer/"
        "relevance_score.\nQuestion: %s\n\nChunk:\n%s",
        "reduce": "Synthesize a JSON answer (reasoning/evidence/answer) "
        "from the chunk analyses.\nQuestion: %s\n\nAnalyses:\n%s",
        "judge": "Judge each item as Correct/Coherent/Deviated/Incorrect/"
        "No answer.\n%s\n\nItems:\n%s",
    },
    "hybrid": {
        "map": "Report Evidence, Answer and 'Score: N' (0-10) lines.\n"
        "Question: %s\n\nChunk:\n%s",
        "reduce": "Combine the scored findings into a JSON answer.\n"
        "Question: %s\n\nFindings:\n%s",
        "judge": "Judge each item (5-way rubric).\n%s\n\nItems:\n%s",
    },
    "plain_text": {
        "map": "Report findings and a 'Score: N' (0-100) line.\n"
        "Question: %s\n\nChunk:\n%s",
        "reduce": "Combine findings into a final answer.\n"
        "Question: %s\n\nFindings:\n%s",
        "judge": "Judge each item (5-way rubric).\n%s\n\nItems:\n%s",
    },
}

_OPTIONAL = {
    "question_improvement": "Rewrite the question for clarity; reply as "
    'JSON {"improved_question": ...}.\nQuestion: %s%s'
}


def load_prompt_set(name: str, include_improvement: bool = False) -> dict[str, str]:
    """S12: resolve a prompt set by format name (json/hybrid/plain_text),
    mirroring the reference's registry + validation (unknown name →
    error, the factory.py:21-25 posture)."""
    if name not in _SETS:
        raise ValueError(f"unknown prompt set {name!r}; one of {sorted(_SETS)}")
    out = dict(_SETS[name])
    if include_improvement:
        out.update(_OPTIONAL)
    return out


def prompt_col(template: str, *cols: Column) -> Column:
    """F15, column form: build the per-row prompt JVM-side
    (format_string, codegen'd — no Python round-trip)."""
    return F.format_string(template, *cols)


def render_prompt(template: str, *values: str) -> str:
    """F15, scalar form for use inside LLM UDF workers."""
    return template % tuple("" if v is None else v for v in values)
