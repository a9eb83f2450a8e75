"""K6/F3 producer-config decoding — error-message and shape parity with the
reference's decode-or-Left chain (/root/reference/src/queue/factory.ts:57-68,
src/queue/eventhub/service.ts:23-83, src/queue/eventhub/utils.ts:14-89).

Pure string/shape validation: no SparkSession, no network.
"""

import pytest

from change_data_capturer_ms_spark.queue.broker_config import (
    NOT_SUPPORTED_ERROR,
    SAS_DECODE_ERROR,
    ProducerConfig,
    decode_queue_params,
    parse_eventhub_sas,
    plain_producer_config,
)

SAS = ("Endpoint=sb://myns.servicebus.windows.net/;"
       "SharedAccessKeyName=sender;SharedAccessKey=abc123=;"
       "EntityPath=changes")


class TestSasDecode:
    def test_happy_path(self):
        cfg = parse_eventhub_sas(SAS)
        assert cfg.brokers == ["myns.servicebus.windows.net:9093"]
        assert cfg.topic == "changes"
        assert cfg.client_id == "sender"
        assert cfg.ssl is True
        # kafkajs SASL/PLAIN contract: username is the literal
        # "$ConnectionString", password is the WHOLE connection string
        assert cfg.sasl == {"mechanism": "plain",
                            "username": "$ConnectionString",
                            "password": SAS}
        # exactly-once wire contract (fromSas/fromConfig defaults)
        assert cfg.idempotent is True
        assert cfg.max_in_flight_requests == 1
        assert cfg.transactional_id == "sender"

    def test_entity_path_optional(self):
        cfg = parse_eventhub_sas(
            "Endpoint=sb://ns.servicebus.windows.net/;"
            "SharedAccessKeyName=k;SharedAccessKey=v")
        assert cfg.topic is None

    def test_order_insensitive_and_trailing_semicolon(self):
        cfg = parse_eventhub_sas(
            "SharedAccessKey=v;Endpoint=sb://ns.x.net;"
            "SharedAccessKeyName=k;")
        assert cfg.brokers == ["ns.x.net:9093"]

    @pytest.mark.parametrize("bad", [
        "",
        "   ",
        "not-a-connection-string",
        "Endpoint=sb://ns.x.net/;SharedAccessKeyName=k",   # missing key
        "Endpoint=sb://ns.x.net/;SharedAccessKey=v",       # missing key name
        "SharedAccessKeyName=k;SharedAccessKey=v",         # missing endpoint
        "Endpoint=https://ns.x.net/;SharedAccessKeyName=k;SharedAccessKey=v",
        "Endpoint=;SharedAccessKeyName=k;SharedAccessKey=v",
        None,
        42,
    ])
    def test_malformed_raises_reference_message(self, bad):
        # every decode failure maps to the one message (eventhub/utils.ts:20)
        with pytest.raises(ValueError, match=SAS_DECODE_ERROR):
            parse_eventhub_sas(bad)


class TestDispatch:
    def test_unknown_queue_type(self):
        # factory.ts:55 message parity
        with pytest.raises(ValueError, match=NOT_SUPPORTED_ERROR):
            decode_queue_params({"queueType": "rabbitmq",
                                 "connectionString": SAS})
        with pytest.raises(ValueError, match=NOT_SUPPORTED_ERROR):
            decode_queue_params({})
        with pytest.raises(ValueError, match=NOT_SUPPORTED_ERROR):
            decode_queue_params("nonsense")

    def test_kafka_branch(self):
        cfg = decode_queue_params({"queueType": "kafka",
                                   "connectionString": SAS})
        assert cfg.auth == "sas" and cfg.topic == "changes"

    def test_passwordless_shape_wins_first(self):
        cfg = decode_queue_params({
            "queueType": "eventhub", "hostName": "ns.servicebus.windows.net",
            "topicName": "changes", "useManagedIdentity": True,
            # extra connectionString must NOT shadow the passwordless branch
            # (service.ts tries EvhPasswordLessQueueParams first)
            "connectionString": SAS,
        })
        assert cfg.auth == "passwordless"
        assert cfg.sasl is None and cfg.ssl is True
        assert cfg.brokers == ["ns.servicebus.windows.net:9093"]

    def test_auth_fallback_shape(self):
        cfg = decode_queue_params({
            "queueType": "eventhub", "useManagedIdentity": False,
            "connectionString": SAS,
        })
        assert cfg.auth == "sas"
        assert cfg.transactional_id == "sender"

    def test_both_decodes_fail_surfaces_auth_branch_message(self):
        # the reference's orElse surfaces the fallback's Left
        # (service.ts:42-56): "Cannot decode Event Hub plain connection
        # params|ERROR=..." naming the failing fields
        with pytest.raises(ValueError) as ei:
            decode_queue_params({"queueType": "eventhub",
                                 "useManagedIdentity": True})
        msg = str(ei.value)
        assert msg.startswith("Cannot decode Event Hub plain connection params|ERROR=")
        assert "connectionString" in msg and "useManagedIdentity" in msg

    def test_auth_shape_with_bad_sas_string(self):
        with pytest.raises(ValueError, match=SAS_DECODE_ERROR):
            decode_queue_params({"queueType": "eventhub",
                                 "useManagedIdentity": False,
                                 "connectionString": "garbage"})


class TestPlainProducer:
    def test_from_sas_plain_twin(self):
        # eventhub/utils.ts:24-41: no SSL/SASL, idempotent, maxInFlight 1,
        # transactionalId = clientId
        cfg = plain_producer_config("localhost:9092", "cdc", "changes")
        assert cfg == ProducerConfig(
            brokers=["localhost:9092"], topic="changes", client_id="cdc",
            ssl=False, sasl=None, idempotent=True, max_in_flight_requests=1,
            transactional_id="cdc", auth="plain")
