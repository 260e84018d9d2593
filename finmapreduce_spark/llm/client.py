"""LLM client protocol + deterministic mock + OpenAI-compatible client.

Reference parity (/root/reference):
- U7 client infra: src/llm/async_llm_client.py — dual token-bucket
  limiter (:269-351), retry with exponential backoff 2s→60s max 50
  (:202-233, :402-435), 600 s request timeout (:371), provider
  factory (:52-91), usage stats (:348-351).
- F7 robust JSON parse: async_llm_client.py:144-195 — strict loads →
  json5 → fenced block → largest-brace candidates; parse failure is
  RETRYABLE (:224-226).

The mock client (FIXTURES.md §10) is a *pure function* of
(prompt_kind, text): relevance scores are md5-derived (the same
``(hexdigit₁ − 1) mod 11`` contract the SQL oracles use), answers echo
deterministic extracts. It makes the full DAG golden-testable with no
network.

The real client is import-gated (no network libs assumed in the
image) and carries the limiter/retry semantics; it is exercised by
unit tests through a fake transport.
"""

from __future__ import annotations

import asyncio
import hashlib
import json
import re
import time
from dataclasses import dataclass, field
from typing import Any, Protocol


# ---------------------------------------------------------------------------
# F7: robust JSON parsing with the reference's fallback chain
# ---------------------------------------------------------------------------

_FENCED = re.compile(r"```(?:json)?\s*(.*?)```", re.DOTALL)
_BACKTICK = re.compile(r"`([^`]*)`")
_BRACE = re.compile(r"\{.*\}", re.DOTALL)


class JSONParseError(ValueError):
    """Raised when every fallback fails — retryable, per reference
    async_llm_client.py:224-226."""


def robust_json_parse(text: str) -> dict[str, Any]:
    """Strict parse → json5-ish cleanup → fenced ```json``` block →
    backticked spans → largest {...} candidates, longest first."""
    candidates: list[str] = [text]
    candidates += _FENCED.findall(text)
    candidates += _BACKTICK.findall(text)
    brace = _BRACE.search(text)
    if brace:
        candidates.append(brace.group(0))
    # longest-first among extracted candidates (reference :186-190)
    for cand in sorted(set(candidates), key=len, reverse=True):
        cand = cand.strip()
        if not cand:
            continue
        try:
            out = json.loads(cand)
            if isinstance(out, dict):
                return out
        except json.JSONDecodeError:
            # json5-ish cleanup: trailing commas, single quotes
            cleaned = re.sub(r",\s*([}\]])", r"\1", cand)
            cleaned = re.sub(r"(?<=[{,])\s*'([^']*)'\s*:", r'"\1":', cleaned)
            cleaned = re.sub(r":\s*'([^']*)'", r': "\1"', cleaned)
            try:
                out = json.loads(cleaned)
                if isinstance(out, dict):
                    return out
            except json.JSONDecodeError:
                continue
    raise JSONParseError(f"unparseable JSON in: {text[:80]!r}")


# ---------------------------------------------------------------------------
# Client protocol
# ---------------------------------------------------------------------------

@dataclass
class LLMResponse:
    # F16: the typed usage struct — kills the reference's 4 duplicated
    # usage-metadata extractors (base_pipeline.py:321-338 et al.)
    content: str
    input_tokens: int = 0
    output_tokens: int = 0
    cache_read_tokens: int = 0


class LLMClient(Protocol):
    async def acomplete(self, prompt: str, *, kind: str = "map") -> LLMResponse: ...


# ---------------------------------------------------------------------------
# Deterministic mock (FIXTURES.md §10)
# ---------------------------------------------------------------------------

def mock_relevance_score(text: str) -> int:
    """(position of first md5 hex digit − 1) mod 11 — identical to the
    SQL expression used by every oracle (functions/text.py:mock_score_0_10)."""
    first = hashlib.md5(text.encode()).hexdigest()[0]
    return "0123456789abcdef".index(first) % 11


def _ws_tokens(s: str) -> int:
    return len(s.split())


class MockLLM:
    """Pure-function client; no network, no state, fully reproducible.

    map    → 'Score: N' content + first/last word echo as evidence
    reduce → concatenated answer over the serialized map results
    judge  → 'Correct' iff candidate equals gold after normalization
    truncation/improve → echo-style deterministic transforms
    """

    async def acomplete(self, prompt: str, *, kind: str = "map") -> LLMResponse:
        usage_in = _ws_tokens(prompt)
        if kind == "map":
            score = mock_relevance_score(prompt)
            words = prompt.split()
            content = (
                f"Evidence: {words[0]} ... {words[-1]}\n"
                f"Answer: {words[len(words) // 2]}\n"
                f"Score: {score}"
                if score > 0
                else "model returned no score"
            )
        elif kind == "map_plain":
            # P4 plain_text format (reference plain_text_formatter.py:
            # 30-56): scores run 0-100 with a strict >50 filter. The
            # 0-100 score is the first md5 BYTE mod 101 — nibble
            # arithmetic every SQL oracle can reproduce.
            h = hashlib.md5(prompt.encode()).hexdigest()
            score = int(h[:2], 16) % 101
            words = prompt.split()
            content = (
                f"Findings: {words[0]} ... {words[-1]}\n"
                f"Score: {score}"
                if score > 0
                else "model returned no score"
            )
        elif kind == "map_json":
            # P2 json format (reference json_formatter.py:17-34 +
            # map_prompt.yml json set): the map reply IS a JSON object
            # carrying relevance_score; score==0 models the malformed /
            # non-JSON reply the reference scores as 0 and filters.
            score = mock_relevance_score(prompt)
            words = prompt.split()
            content = (
                json.dumps(
                    {
                        "summary": f"chunk of {len(words)} words",
                        "terms": [words[0], words[-1]],
                        "evidence": [words[0]],
                        "answer": words[len(words) // 2],
                        "relevance_score": score,
                    }
                )
                if score > 0
                else "model returned no score"
            )
        elif kind == "reduce":
            h = hashlib.md5(prompt.encode()).hexdigest()[:8]
            content = json.dumps(
                {
                    "reasoning": f"synthesized from {usage_in} tokens",
                    "evidence": [h],
                    "answer": f"answer-{h}",
                }
            )
        elif kind == "judge":
            # Batch form (reference U4): one call judges an
            # <evaluation_items> XML of ≤5 items, returning
            # evaluation_results with 1-based evaluation_number
            # (async_evaluation.py:297-350).
            items = re.findall(
                r"<llm_answer>(.*?)</llm_answer>\s*<gold>(.*?)</gold>",
                prompt,
                re.DOTALL,
            )
            results = []
            for i, (cand, gold) in enumerate(items, start=1):
                cand, gold = cand.strip(), gold.strip()
                if not cand:
                    verdict = "No answer"
                elif cand.lower() == gold.lower():
                    verdict = "Correct"
                else:
                    verdict = "Incorrect"
                results.append(
                    {
                        "evaluation_number": i,
                        "judgement": verdict,
                        "reasoning": "mock",
                    }
                )
            if len(results) == 1:
                content = json.dumps(
                    {"judgement": results[0]["judgement"], "reasoning": "mock"}
                )
            else:
                content = json.dumps({"evaluation_results": results})
        elif kind == "truncation":
            # U3: single direct call over (truncated_doc, question) —
            # reference truncation_formatter.py:75-97
            h = hashlib.md5(prompt.encode()).hexdigest()[:8]
            content = json.dumps(
                {"answer": f"answer-{h}", "reasoning": "truncation path"}
            )
        else:  # improve_question (U5) — fallback-to-original on failure
            content = json.dumps(
                {"improved_question": f"Improved: {prompt}" if prompt else ""}
            )
        return LLMResponse(
            content=content,
            input_tokens=usage_in,
            output_tokens=_ws_tokens(content),
            cache_read_tokens=0,
        )


# ---------------------------------------------------------------------------
# U7: dual token-bucket rate limiter (requests/min + tokens/min)
# ---------------------------------------------------------------------------

@dataclass
class RateLimitConfig:
    # reference main_async.py:67-74 defaults
    requests_per_minute: int = 30_000
    tokens_per_minute: int = 150_000_000
    burst: int = 3_000
    max_retries: int = 50
    base_backoff_s: float = 2.0
    max_backoff_s: float = 60.0
    request_timeout_s: float = 600.0


def per_executor_budget(cfg: RateLimitConfig, n_executors: int) -> RateLimitConfig:
    """Split a GLOBAL rate budget across executors (SURVEY §4: the
    limiter is executor-local, so each executor gets budget/n). Retry
    and timeout semantics are per-call and stay unchanged."""
    from dataclasses import replace

    n = max(1, n_executors)
    return replace(
        cfg,
        requests_per_minute=max(1, cfg.requests_per_minute // n),
        tokens_per_minute=max(1, cfg.tokens_per_minute // n),
        burst=max(1, cfg.burst // n),
    )


class DualTokenBucket:
    """Two coupled buckets (requests + tokens); acquire blocks until
    both grant. Executor-local: at cluster scale each executor gets
    budget/num_executors (SURVEY §4 rate-limiting note)."""

    def __init__(self, cfg: RateLimitConfig, clock=time.monotonic, sleep=asyncio.sleep):
        self.cfg = cfg
        self._clock = clock
        self._sleep = sleep
        self._req = float(cfg.burst)
        self._tok = float(cfg.tokens_per_minute)
        self._last = clock()
        self._lock = asyncio.Lock()

    def _refill(self):
        now = self._clock()
        dt = now - self._last
        self._last = now
        self._req = min(
            self.cfg.burst, self._req + dt * self.cfg.requests_per_minute / 60.0
        )
        self._tok = min(
            float(self.cfg.tokens_per_minute),
            self._tok + dt * self.cfg.tokens_per_minute / 60.0,
        )

    async def acquire(self, est_tokens: int):
        while True:
            async with self._lock:
                self._refill()
                if self._req >= 1 and self._tok >= est_tokens:
                    self._req -= 1
                    self._tok -= est_tokens
                    return
                need_req = max(0.0, 1 - self._req) * 60.0 / self.cfg.requests_per_minute
                need_tok = (
                    max(0.0, est_tokens - self._tok)
                    * 60.0
                    / self.cfg.tokens_per_minute
                )
            await self._sleep(max(need_req, need_tok, 0.005))


def estimate_tokens(prompt: str, max_output: int = 1024) -> int:
    """F14: (prompt_tokens + max_tokens) × 1.15 safety buffer, char/4
    fallback (reference async_llm_client.py:98-123)."""
    prompt_tokens = max(_ws_tokens(prompt), len(prompt) // 4)
    return int((prompt_tokens + max_output) * 1.15)


@dataclass
class RetryStats:
    attempts: int = 0
    retries: int = 0
    failures: int = 0
    parse_retries: int = 0


class RateLimitedClient:
    """Wraps any LLMClient with the limiter + retry/backoff/timeout
    semantics of the reference (U7). JSON-parse failures are retryable
    when expect_json=True."""

    def __init__(
        self,
        inner: LLMClient,
        cfg: RateLimitConfig | None = None,
        *,
        sleep=asyncio.sleep,
        request_cache_size: int = 0,
    ):
        self.inner = inner
        self.cfg = cfg or RateLimitConfig()
        self.bucket = DualTokenBucket(self.cfg)
        self.stats = RetryStats()
        self._sleep = sleep
        # Request-key idempotency cache (SURVEY §4): identical
        # (kind, prompt) pairs — duplicate docs, repeated questions,
        # task retries within a worker — pay the API exactly once per
        # executor. SUCCESSFUL responses only (failed parses must
        # retry fresh); FIFO-bounded. 0 = off (tests measure the raw
        # path). Cross-run idempotency belongs to a response-cache
        # table + dropDuplicates upstream, not here.
        self._cache_size = request_cache_size
        self._cache: dict[tuple[str, str], LLMResponse] = {}

    async def acomplete(
        self, prompt: str, *, kind: str = "map", expect_json: bool = False
    ) -> LLMResponse:
        key = None
        if self._cache_size:
            key = (kind, hashlib.md5(prompt.encode()).hexdigest())
            hit = self._cache.get(key)
            if hit is not None:
                return hit
        backoff = self.cfg.base_backoff_s
        last_err: Exception | None = None
        for _ in range(self.cfg.max_retries):
            self.stats.attempts += 1
            await self.bucket.acquire(estimate_tokens(prompt))
            try:
                resp = await asyncio.wait_for(
                    self.inner.acomplete(prompt, kind=kind),
                    timeout=self.cfg.request_timeout_s,
                )
                if expect_json:
                    robust_json_parse(resp.content)  # parse failure → retry
                if key is not None:
                    if len(self._cache) >= self._cache_size:
                        self._cache.pop(next(iter(self._cache)))
                    self._cache[key] = resp
                return resp
            except JSONParseError as e:
                self.stats.parse_retries += 1
                last_err = e
            except (asyncio.TimeoutError, ConnectionError, OSError) as e:
                last_err = e
            self.stats.retries += 1
            await self._sleep(backoff)
            backoff = min(backoff * 2, self.cfg.max_backoff_s)
        self.stats.failures += 1
        raise RuntimeError(f"LLM call failed after retries: {last_err}")


# ---------------------------------------------------------------------------
# Real OpenAI-compatible transport (reference async_llm_client.py:52-91
# request shaping, :353-435 POST + response extraction). Stdlib-only:
# urllib wrapped in asyncio.to_thread — no SDK assumed in the image.
# Wrap in RateLimitedClient for the limiter/retry/backoff semantics.
# ---------------------------------------------------------------------------

class RetryableHTTPError(ConnectionError):
    """HTTP 429 / 5xx — transient; RateLimitedClient's retry loop
    already catches ConnectionError, so subclassing slots this into
    the existing backoff path with no new except-arm."""

    def __init__(self, status: int, body: str = ""):
        super().__init__(f"HTTP {status}: {body[:200]}")
        self.status = status


class FatalHTTPError(RuntimeError):
    """HTTP 4xx other than 429 — the request itself is wrong (bad
    auth, bad model, oversized payload); retrying cannot help."""

    def __init__(self, status: int, body: str = ""):
        super().__init__(f"HTTP {status}: {body[:200]}")
        self.status = status


@dataclass
class ProviderConfig:
    """OpenAI-compatible endpoint config. ``api_key`` may be passed
    directly (tests) or resolved from ``api_key_env`` at call time so
    executors pick up their own environment."""

    base_url: str = "https://api.openai.com/v1"
    model: str = "gpt-4o-mini"
    api_key_env: str = "OPENAI_API_KEY"
    temperature: float = 0.0
    max_tokens: int = 1024
    system_prompt: str | None = None
    # urllib has ONE socket timeout covering connect + the full read:
    # non-streaming completions send nothing until generation ends, so
    # this must cover whole-generation latency. It matches the
    # reference's 600 s request timeout (async_llm_client.py:371) and
    # RateLimitedClient's request_timeout_s, which is the real
    # per-attempt ceiling.
    timeout_s: float = 600.0


# Provider presets — reference parity with the factory's two explicit
# arms (async_llm_client.py:52-91): "openai" resolves OPENAI_API_KEY
# against the public OpenAI endpoint, "openrouter" resolves
# OPENROUTER_API_KEY against the public OpenRouter endpoint. Both are
# ordinary OpenAI-compatible chat/completions surfaces, so the client,
# limiter, and retry stack are identical; only base_url/key/model
# defaults differ.
_PROVIDER_PRESETS: dict[str, dict[str, str]] = {
    "openai": {
        "base_url": "https://api.openai.com/v1",
        "api_key_env": "OPENAI_API_KEY",
        "model": "gpt-4o-mini",
    },
    "openrouter": {
        "base_url": "https://openrouter.ai/api/v1",
        "api_key_env": "OPENROUTER_API_KEY",
        "model": "deepseek/deepseek-r1-0528:free",
    },
}


def provider_config(provider: str = "openai", **overrides: Any) -> ProviderConfig:
    """Build a ProviderConfig from a named provider preset.

    ``overrides`` are ProviderConfig fields (model, base_url,
    temperature, ...) applied on top of the preset, mirroring how the
    reference factory lets LLMConfig override base_url per provider.
    """
    preset = _PROVIDER_PRESETS.get(provider.lower())
    if preset is None:
        raise ValueError(
            f"unknown provider {provider!r}; known: {sorted(_PROVIDER_PRESETS)}"
        )
    return ProviderConfig(**{**preset, **overrides})


class OpenAICompatClient:
    """POST {base_url}/chat/completions with the standard payload
    (model, messages, temperature, max_tokens) and map the response to
    the typed ``LLMResponse`` (F16).

    ``transport`` is injectable: a callable ``(url, headers: dict,
    payload: bytes) -> (status: int, body: bytes)``. The default is a
    blocking urllib POST run in a worker thread per call; tests drive
    the full client through a fake transport, which is also how the
    limiter/retry stack is exercised without network.
    """

    def __init__(
        self,
        cfg: ProviderConfig | None = None,
        *,
        api_key: str | None = None,
        transport=None,
    ):
        self.cfg = cfg or ProviderConfig()
        self._api_key = api_key
        self._transport = transport or self._urllib_post

    # -- request shaping (reference async_llm_client.py:52-91) --------
    def build_payload(self, prompt: str, kind: str) -> dict[str, Any]:
        messages: list[dict[str, str]] = []
        if self.cfg.system_prompt:
            messages.append({"role": "system", "content": self.cfg.system_prompt})
        messages.append({"role": "user", "content": prompt})
        payload: dict[str, Any] = {
            "model": self.cfg.model,
            "messages": messages,
            "temperature": self.cfg.temperature,
            "max_tokens": self.cfg.max_tokens,
        }
        # JSON-emitting stages opt into the provider-side JSON mode;
        # hybrid/plain map replies are plain text with a trailing
        # Score: line, but the json-format map (P2) is a JSON object.
        # OpenAI REJECTS json_object requests whose messages never
        # mention JSON, and the reference never sends response_format
        # at all (it only parses client-side — async_llm_client.py:
        # 144-195 robust chain), so JSON mode is an opt-in extra: set
        # it only when the rendered messages actually say JSON.
        # Notably format_type=json auto-resolves to the 'default' set
        # whose map template has no JSON wording (mirroring the
        # reference's map_prompt_hybrid.yml) — that call must go out
        # as a plain completion and rely on the robust parse.
        if kind in ("reduce", "judge", "truncation", "improve", "map_json"):
            mentions_json = any(
                "json" in m["content"].lower() for m in messages
            )
            if mentions_json:
                payload["response_format"] = {"type": "json_object"}
        return payload

    def _resolve_key(self) -> str:
        if self._api_key:
            return self._api_key
        import os

        key = os.environ.get(self.cfg.api_key_env, "")
        if not key:
            raise FatalHTTPError(
                401, f"no API key: set ${self.cfg.api_key_env} or pass api_key"
            )
        return key

    def _urllib_post(self, url: str, headers: dict, payload: bytes):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, data=payload, headers=headers, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=self.cfg.timeout_s) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:  # non-2xx: report status
            return e.code, e.read()
        except urllib.error.URLError as e:  # DNS/conn refused: retryable
            raise ConnectionError(str(e.reason)) from e

    # -- response extraction (reference :353-435) ----------------------
    @staticmethod
    def parse_response(body: bytes) -> LLMResponse:
        data = json.loads(body)
        try:
            content = data["choices"][0]["message"]["content"] or ""
        except (KeyError, IndexError, TypeError) as e:
            raise RetryableHTTPError(502, f"malformed completion body: {e}")
        usage = data.get("usage") or {}
        cached = (usage.get("prompt_tokens_details") or {}).get("cached_tokens", 0)
        return LLMResponse(
            content=content,
            input_tokens=int(usage.get("prompt_tokens", 0)),
            output_tokens=int(usage.get("completion_tokens", 0)),
            cache_read_tokens=int(cached or 0),
        )

    async def acomplete(self, prompt: str, *, kind: str = "map") -> LLMResponse:
        url = self.cfg.base_url.rstrip("/") + "/chat/completions"
        headers = {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {self._resolve_key()}",
        }
        payload = json.dumps(self.build_payload(prompt, kind)).encode()
        status, body = await asyncio.to_thread(
            self._transport, url, headers, payload
        )
        if status == 429 or status >= 500:
            raise RetryableHTTPError(status, body.decode("utf-8", "replace"))
        if status >= 400:
            raise FatalHTTPError(status, body.decode("utf-8", "replace"))
        return self.parse_response(body)
