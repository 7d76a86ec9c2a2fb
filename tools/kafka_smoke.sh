#!/usr/bin/env bash
# One-command live-broker proof of the Kafka wiring (docs/KAFKA.md).
#
# Requires: Docker, network access for the connector jar on first run.
# Starts a throwaway single-node broker, points Spark at the matching
# spark-sql-kafka connector, runs the env-gated integration test, and
# tears the broker down again — pass or fail.
#
#   ./tools/kafka_smoke.sh
#
# The repo's CI/sandbox has neither Docker nor a broker, so the test
# self-skips there; this script is the recipe for any host that does.
set -euo pipefail
cd "$(dirname "$0")/.."

NAME=lh-kafka-smoke
docker rm -f "$NAME" >/dev/null 2>&1 || true
docker run -d --name "$NAME" -p 9092:9092 apache/kafka:3.7.0 >/dev/null
trap 'docker rm -f "$NAME" >/dev/null 2>&1 || true' EXIT

echo "waiting for broker..." >&2
for _ in $(seq 1 60); do
    if docker exec "$NAME" /opt/kafka/bin/kafka-broker-api-versions.sh \
        --bootstrap-server localhost:9092 >/dev/null 2>&1; then
        break
    fi
    sleep 1
done

# Connector artifact pinned to the installed pyspark (scala 2.13 for 4.x).
PYSPARK_VERSION=$(python -c 'import pyspark; print(pyspark.__version__)')
export PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:${PYSPARK_VERSION} pyspark-shell"

KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_integration.py -v
