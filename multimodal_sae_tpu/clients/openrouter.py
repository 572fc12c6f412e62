"""OpenRouter chat client via plain HTTP POST
(reference sae_auto_interp/clients/openrouter.py:14-68)."""

from __future__ import annotations

import asyncio
import json
import os
from typing import Optional

from ..logger import logger
from .client import Client


class OpenRouter(Client):
    provider = "openrouter"

    def __init__(
        self,
        model: str,
        api_key: Optional[str] = None,
        base_url: str = "https://openrouter.ai/api/v1/chat/completions",
    ):
        super().__init__(model)
        self.url = base_url
        self.api_key = api_key or os.environ.get("OPENROUTER_API_KEY", "")
        self._client = None

    def _httpx(self):
        import httpx

        if self._client is None:
            self._client = httpx.AsyncClient()
        return self._client

    def postprocess(self, response) -> str:
        return response.json()["choices"][0]["message"]["content"]

    async def generate(
        self, prompt, raw: bool = False, max_retries: int = 2, **kwargs
    ) -> str:
        if isinstance(prompt, str):
            prompt = [{"role": "user", "content": prompt}]
        headers = {"Authorization": f"Bearer {self.api_key}"}
        data = {"model": self.model, "messages": prompt, **kwargs}
        last_err = None
        for attempt in range(max_retries):
            try:
                response = await self._httpx().post(
                    url=self.url, json=data, headers=headers
                )
                if response is None:
                    raise RuntimeError("Response is None")
                return response if raw else self.postprocess(response)
            except json.JSONDecodeError as e:
                last_err = e
                logger.warning(f"Attempt {attempt + 1}: Invalid JSON response, retrying... {e}")
            except Exception as e:
                last_err = e
                logger.warning(f"Attempt {attempt + 1}: {e}, retrying...")
            await asyncio.sleep(1)
        logger.error(f"All retry attempts failed. Most recent error: {last_err}")
        raise last_err
