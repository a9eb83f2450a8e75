"""Error types with message parity to the reference factories.

The reference returns typed Lefts with exact messages for unknown service/queue kinds
(/root/reference/src/factory/factory.ts:20, /root/reference/src/queue/factory.ts:55);
we keep the same messages so the registry contract is observable.
"""


class EngineError(Exception):
    """Base class for engine errors."""


class NotSupportedError(EngineError):
    """Unknown source kind — reference: `Service still not supported`
    (/root/reference/src/factory/factory.ts:20)."""

    def __init__(self, message: str = "Service still not supported") -> None:
        super().__init__(message)


class QueueNotSupportedError(EngineError):
    """Unknown sink kind — reference: `Queue type still not supported`
    (/root/reference/src/queue/factory.ts:55)."""

    def __init__(self, message: str = "Queue type still not supported") -> None:
        super().__init__(message)


class MissingResourceError(EngineError):
    """Table/collection does not exist — reference `getMongoCollection` Left on a
    missing collection (/root/reference/src/capturer/mongo/utils.ts:33-49)."""


class ConfigError(EngineError):
    """Invalid engine configuration — reference `getConfigOrThrow`
    (/root/reference/src/utils/configReader.ts:38-44) throws a readable report."""
