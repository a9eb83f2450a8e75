"""Broker connection-config decoding — the reference's K6/F3 surface
(producer config variants), re-derived offline.

The reference builds its queue producer through a decode-or-Left chain
(/root/reference/src/queue/factory.ts:19-68,
 src/queue/eventhub/service.ts:23-83, src/queue/eventhub/utils.ts:14-89):

1. `createInternalQueueService(params)` dispatches on `queueType`
   (EventHub | Kafka), unknown type => `Queue type still not supported`.
2. EventHub tries the PASSWORDLESS shape first — `{hostName, topicName,
   useManagedIdentity: true}` (DefaultAzureCredential identity) — and falls
   back to the AUTH shape `{connectionString, useManagedIdentity: false}`.
3. The SAS connection string decodes via `AzureEventhubSasFromString` (public
   @pagopa/fp-ts-kafkajs): `Endpoint=sb://<ns>.servicebus.windows.net/;
   SharedAccessKeyName=<kn>;SharedAccessKey=<key>[;EntityPath=<topic>]` maps
   to a Kafka-protocol producer config — broker `<ns>...:9093`, SASL/PLAIN
   with username `$ConnectionString` and the WHOLE connection string as
   password, idempotent + transactional producer (exactly-once wire contract,
   matching this engine's ledger semantics).

This module does the decoding with the reference's exact error message shapes;
`bind_queue_service` then returns the engine's offline stand-in sink (a
`JsonQueueSink` bound to a path) carrying the validated producer config, so
deployments swap in a real Kafka/EventHub client without touching callers.
No network is touched here — decoding is pure string/shape validation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

EVENTHUB = "eventhub"
KAFKA = "kafka"

NOT_SUPPORTED_ERROR = "Queue type still not supported"
SAS_DECODE_ERROR = "Error during decoding Event Hub SAS"

# Endpoint=sb://<ns>.servicebus.windows.net/;SharedAccessKeyName=..;
# SharedAccessKey=..[;EntityPath=..]  — order-insensitive on the k=v parts,
# like the Azure SDK's own connection-string parser.
_ENDPOINT_RE = re.compile(r"^sb://(?P<host>[^/;]+)/?$")


@dataclass
class ProducerConfig:
    """The decoded producer config (fromSas/fromConfig shape,
    @pagopa/fp-ts-kafkajs KafkaProducerCompact)."""

    brokers: list[str]
    topic: str | None
    client_id: str
    ssl: bool
    sasl: dict | None = None
    idempotent: bool = True
    max_in_flight_requests: int = 1
    transactional_id: str | None = None
    auth: str = "sas"  # sas | passwordless | plain
    extra: dict = field(default_factory=dict)


def parse_eventhub_sas(connection_string: str) -> ProducerConfig:
    """Decode an Event Hub SAS connection string (AzureEventhubSasFromString
    twin). Raises ValueError(SAS_DECODE_ERROR) on any malformed input — the
    reference maps every decode failure to this one message
    (eventhub/utils.ts:20,77)."""
    if not isinstance(connection_string, str) or not connection_string.strip():
        raise ValueError(SAS_DECODE_ERROR)
    parts: dict[str, str] = {}
    for chunk in connection_string.strip().rstrip(";").split(";"):
        if not chunk:
            continue
        k, sep, v = chunk.partition("=")
        if not sep or not k or not v:
            raise ValueError(SAS_DECODE_ERROR)
        parts[k] = v
    endpoint = parts.get("Endpoint")
    key_name = parts.get("SharedAccessKeyName")
    key = parts.get("SharedAccessKey")
    if not endpoint or not key_name or not key:
        raise ValueError(SAS_DECODE_ERROR)
    m = _ENDPOINT_RE.match(endpoint)
    if not m:
        raise ValueError(SAS_DECODE_ERROR)
    host = m.group("host")
    return ProducerConfig(
        brokers=[f"{host}:9093"],
        topic=parts.get("EntityPath"),
        client_id=key_name,
        ssl=True,
        sasl={
            "mechanism": "plain",
            "username": "$ConnectionString",
            "password": connection_string,
        },
        transactional_id=key_name,
        auth="sas",
    )


def plain_producer_config(broker: str, client_id: str, topic: str) -> ProducerConfig:
    """fromSasPlain twin (eventhub/utils.ts:24-41): local/plain broker,
    no SSL/SASL, still idempotent + transactional."""
    return ProducerConfig(
        brokers=[str(broker)],
        topic=topic,
        client_id=client_id,
        ssl=False,
        sasl=None,
        transactional_id=client_id,
        auth="plain",
    )


def _readable(missing: list[str]) -> str:
    # errorsToReadableMessages parity in spirit: name the failing fields
    return ", ".join(f"value undefined at {m}" for m in missing)


def decode_queue_params(params: dict) -> ProducerConfig:
    """createInternalQueueService twin: dispatch on queueType; for EventHub,
    try passwordless first, then the SAS-auth shape (service.ts:23-61).

    Error-message parity:
    - unknown queueType           -> NOT_SUPPORTED_ERROR
    - both EventHub decodes fail  -> the AUTH branch's message (the reference's
      orElse surfaces the fallback's Left), i.e.
      `Cannot decode Event Hub plain connection params|ERROR=...`
    - malformed SAS string        -> SAS_DECODE_ERROR
    """
    if not isinstance(params, dict):
        raise ValueError(NOT_SUPPORTED_ERROR)
    qt = params.get("queueType")
    if qt == KAFKA:
        cs = params.get("connectionString")
        if not isinstance(cs, str):
            raise ValueError(SAS_DECODE_ERROR)
        return parse_eventhub_sas(cs)
    if qt != EVENTHUB:
        raise ValueError(NOT_SUPPORTED_ERROR)

    # passwordless shape: {hostName, topicName, useManagedIdentity: true}
    missing = [k for k in ("hostName", "topicName")
               if not isinstance(params.get(k), str)]
    if params.get("useManagedIdentity") is True and not missing:
        return ProducerConfig(
            brokers=[f"{params['hostName']}:9093"],
            topic=params["topicName"],
            client_id=params["topicName"],
            ssl=True,
            sasl=None,  # identity credential, not SASL
            transactional_id=params["topicName"],
            auth="passwordless",
        )

    # fallback: SAS-auth shape {connectionString, useManagedIdentity: false}
    cs = params.get("connectionString")
    bad = []
    if not isinstance(cs, str):
        bad.append("connectionString")
    if params.get("useManagedIdentity") is not False:
        bad.append("useManagedIdentity")
    if bad:
        raise ValueError(
            "Cannot decode Event Hub plain connection params|ERROR="
            + _readable(bad)
        )
    return parse_eventhub_sas(cs)


def bind_queue_service(spark, path: str, params: dict, **sink_kwargs):
    """Decode-or-raise the producer params, then bind the engine's offline
    queue sink with the validated config attached (`sink.producer_config`).
    A real deployment replaces only the transport: same produce() contract,
    same exactly-once marker/ledger semantics (queue_json.py)."""
    from change_data_capturer_ms_spark.queue.queue_json import JsonQueueSink

    cfg = decode_queue_params(params)
    sink = JsonQueueSink(spark, path, **sink_kwargs)
    sink.producer_config = cfg
    return sink
