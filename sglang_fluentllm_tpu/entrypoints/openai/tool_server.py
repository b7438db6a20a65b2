"""Server-side tool execution for the Responses API.

Analog of the reference's ``entrypoints/openai/tool_server.py``
(``ToolServer`` ABC + ``MCPToolServer``/``DemoToolServer``): tools the
SERVER executes inside the response loop, as opposed to OpenAI function
tools the client executes. The reference's demo tools (harmony
python/browser) need external runtimes; ours ships a deterministic
in-process registry suitable for air-gapped serving, plus an MCP bridge
gated on the ``mcp`` package being installed.

Enable with ``--tool-server demo`` (registry) or ``--tool-server
<host:port[,host:port]>`` (MCP SSE endpoints, reference semantics).
"""

from __future__ import annotations

import asyncio
import inspect
import logging
from typing import Any, Callable, Dict, List, Optional

logger = logging.getLogger(__name__)


class ToolServer:
    """Interface: which tools exist, their OpenAI function schemas, and
    how to run one (reference tool_server.py ToolServer ABC)."""

    def has_tool(self, name: str) -> bool:
        raise NotImplementedError

    def list_tools(self) -> List[Dict[str, Any]]:
        """OpenAI ``tools`` array entries (type=function)."""
        raise NotImplementedError

    async def execute(self, name: str, arguments: Dict[str, Any]) -> str:
        raise NotImplementedError


class LocalToolServer(ToolServer):
    """In-process tool registry (DemoToolServer role). Register plain
    callables with a JSON-schema parameter spec; sync callables run in
    the default executor so tools never block the event loop."""

    def __init__(self):
        self._tools: Dict[str, Dict[str, Any]] = {}

    def register(self, name: str, fn: Callable[..., Any],
                 description: str = "",
                 parameters: Optional[Dict[str, Any]] = None):
        self._tools[name] = {
            "fn": fn,
            "spec": {
                "type": "function",
                "function": {
                    "name": name,
                    "description": description,
                    "parameters": parameters
                    or {"type": "object", "properties": {}},
                },
            },
        }
        return self

    def has_tool(self, name: str) -> bool:
        return name in self._tools

    def list_tools(self) -> List[Dict[str, Any]]:
        return [t["spec"] for t in self._tools.values()]

    async def execute(self, name: str, arguments: Dict[str, Any]) -> str:
        fn = self._tools[name]["fn"]
        if inspect.iscoroutinefunction(fn):
            out = await fn(**arguments)
        else:
            loop = asyncio.get_running_loop()
            out = await loop.run_in_executor(None, lambda: fn(**arguments))
        return out if isinstance(out, str) else str(out)


def demo_tool_server() -> LocalToolServer:
    """Deterministic demo tools (tests + smoke deployments)."""
    srv = LocalToolServer()
    srv.register(
        "add", lambda a, b: str(a + b),
        description="Add two numbers.",
        parameters={
            "type": "object",
            "properties": {"a": {"type": "number"},
                           "b": {"type": "number"}},
            "required": ["a", "b"],
        },
    )
    srv.register(
        "echo", lambda text: text,
        description="Echo the given text back.",
        parameters={
            "type": "object",
            "properties": {"text": {"type": "string"}},
            "required": ["text"],
        },
    )
    return srv


class McpToolServer(ToolServer):
    """MCP SSE bridge (reference MCPToolServer). Requires the ``mcp``
    package; construction fails fast with a clear message otherwise."""

    def __init__(self, urls: str):
        try:
            import mcp  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "--tool-server <url> requires the 'mcp' package; use "
                "--tool-server demo for the in-process registry"
            ) from e
        self._urls = [u.strip() for u in urls.split(",") if u.strip()]
        self._tools: Dict[str, Dict[str, Any]] = {}

    async def connect(self):
        from mcp import ClientSession
        from mcp.client.sse import sse_client

        for base in self._urls:
            url = f"http://{base}/sse"
            async with sse_client(url=url) as streams:
                async with ClientSession(*streams) as session:
                    await session.initialize()
                    listed = await session.list_tools()
            for tool in listed.tools:
                self._tools[tool.name] = {
                    "url": url,
                    "spec": {
                        "type": "function",
                        "function": {
                            "name": tool.name,
                            "description": tool.description or "",
                            "parameters": tool.inputSchema,
                        },
                    },
                }

    def has_tool(self, name: str) -> bool:
        return name in self._tools

    def list_tools(self) -> List[Dict[str, Any]]:
        return [t["spec"] for t in self._tools.values()]

    async def execute(self, name: str, arguments: Dict[str, Any]) -> str:
        from mcp import ClientSession
        from mcp.client.sse import sse_client

        url = self._tools[name]["url"]
        async with sse_client(url=url) as streams:
            async with ClientSession(*streams) as session:
                await session.initialize()
                result = await session.call_tool(name, arguments)
        parts = []
        for c in getattr(result, "content", []) or []:
            parts.append(getattr(c, "text", None) or str(c))
        return "\n".join(parts)


def build_tool_server(spec: Optional[str]) -> Optional[ToolServer]:
    if not spec:
        return None
    if spec == "demo":
        return demo_tool_server()
    return McpToolServer(spec)
