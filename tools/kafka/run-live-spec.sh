#!/usr/bin/env bash
# Run the live S3/S4 Kafka integration leg against the docker-compose broker.
#
# The sandbox ships Spark without the Kafka connector; on a networked host
# this fetches the two connector jars matching the installed Spark, drops
# them on the test classpath via SPARK_EXTRA_JARS, and runs KafkaLiveSpec.
set -euo pipefail
cd "$(dirname "$0")/../.."

SPARK_VER="$(ls /opt/spark/jars/spark-sql_2.13-*.jar | sed 's/.*_2.13-\(.*\)\.jar/\1/')"
KAFKA_CLIENTS_VER=3.9.0
JARDIR="tools/kafka/jars"
mkdir -p "$JARDIR"
base=https://repo1.maven.org/maven2/org/apache/spark
for a in spark-sql-kafka-0-10_2.13 spark-token-provider-kafka-0-10_2.13; do
  [ -f "$JARDIR/$a-$SPARK_VER.jar" ] || \
    curl -fsSL -o "$JARDIR/$a-$SPARK_VER.jar" "$base/$a/$SPARK_VER/$a-$SPARK_VER.jar"
done
[ -f "$JARDIR/kafka-clients-$KAFKA_CLIENTS_VER.jar" ] || \
  curl -fsSL -o "$JARDIR/kafka-clients-$KAFKA_CLIENTS_VER.jar" \
    "https://repo1.maven.org/maven2/org/apache/kafka/kafka-clients/$KAFKA_CLIENTS_VER/kafka-clients-$KAFKA_CLIENTS_VER.jar"

# build.sbt already appends SPARK_EXTRA_JARS (colon-separated) to
# unmanagedJars when set; see the Kafka section in README "Running".
export SPARK_EXTRA_JARS="$(ls "$JARDIR"/*.jar | paste -sd:)"
export GRAFT_KAFKA_BOOTSTRAP="${GRAFT_KAFKA_BOOTSTRAP:-localhost:9092}"
exec sbt "testOnly graft.KafkaLiveSpec"
