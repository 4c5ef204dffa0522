"""HTTP client for the service (reference: src/tools/inferflow_client.cc +
sslib HttpClient), stdlib-only."""

from __future__ import annotations

import json
from typing import Iterator, Optional
from urllib import request as urlreq


class InferFlowClient:
    def __init__(self, base_url: str = "http://127.0.0.1:8080"):
        self.base_url = base_url.rstrip("/")

    def query(self, text: str, system_prompt: str = "",
              max_output_len: int = 256, temperature: float = 1.0,
              decoding_alg: str = "", openai: bool = False,
              timeout: float = 300.0) -> dict:
        """Blocking (non-streaming) request; returns the parsed response."""
        if openai:
            body = {"messages": [{"role": "user", "content": text}],
                    "max_tokens": max_output_len,
                    "temperature": temperature, "stream": False}
            url = self.base_url + "/v1/chat/completions"
        else:
            body = {"text": text, "system_prompt": system_prompt,
                    "max_output_len": max_output_len,
                    "temperature": temperature,
                    "decoding_alg": decoding_alg,
                    "is_streaming_mode": False}
            url = self.base_url + "/"
        req = urlreq.Request(url, json.dumps(body).encode("utf-8"),
                             {"Content-Type": "application/json"})
        with urlreq.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def stream(self, text: str, max_output_len: int = 256,
               openai: bool = False, timeout: float = 300.0
               ) -> Iterator[dict]:
        """SSE streaming request; yields parsed chunks."""
        if openai:
            body = {"messages": [{"role": "user", "content": text}],
                    "max_tokens": max_output_len, "stream": True}
            url = self.base_url + "/v1/chat/completions"
        else:
            body = {"text": text, "max_output_len": max_output_len,
                    "is_streaming_mode": True}
            url = self.base_url + "/"
        req = urlreq.Request(url, json.dumps(body).encode("utf-8"),
                             {"Content-Type": "application/json"})
        with urlreq.urlopen(req, timeout=timeout) as resp:
            for raw in resp:
                line = raw.decode("utf-8").strip()
                if not line.startswith("data:"):
                    continue
                payload = line[len("data:"):].strip()
                if payload == "[DONE]":
                    return
                yield json.loads(payload)
