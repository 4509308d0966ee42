"""User-facing entrypoints: offline inference CLI and the OpenAI server."""
