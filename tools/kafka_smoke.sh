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
ready=0
for _ in $(seq 1 60); do
    if docker exec "$NAME" /opt/kafka/bin/kafka-broker-api-versions.sh \
        --bootstrap-server localhost:9092 >/dev/null 2>&1; then
        ready=1
        break
    fi
    sleep 1
done
if [ "$ready" != 1 ]; then
    echo "error: broker never became ready after 60s — container logs:" >&2
    docker logs --tail 30 "$NAME" >&2 || true
    exit 1
fi

# Connector artifact pinned to the installed pyspark; PyPI wheels
# bundle Scala 2.12 jars through 3.x and 2.13 from 4.x on.
PYSPARK_VERSION=$(python -c 'import pyspark; print(pyspark.__version__)')
case "$PYSPARK_VERSION" in
    3.*) SCALA_SUFFIX=2.12 ;;
    *)   SCALA_SUFFIX=2.13 ;;
esac
export PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_${SCALA_SUFFIX}:${PYSPARK_VERSION} pyspark-shell"

KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_integration.py -v
