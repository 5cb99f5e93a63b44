# Container packaging for the engine, mirroring the reference's shipped
# image (/root/reference/docker-compose.yaml) in Spark-native form: a
# slim Python base with a JRE for the in-process Spark driver. On a real
# cluster this image is the driver/executor container (spark-submit or
# Spark-on-K8s); standalone it runs local[*].
FROM python:3.11-slim-bookworm

RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

WORKDIR /app
COPY pyproject.toml README.md ./
COPY k8e_fetch_spark ./k8e_fetch_spark
RUN pip install --no-cache-dir .

# JDBC driver for the Postgres sink (plans/pipeline.py:write_jdbc) —
# ship a pinned org.postgresql:postgresql jar here (or mount it) and
# point spark.jars at it when the sink is enabled.

ENTRYPOINT ["python", "-c", "import k8e_fetch_spark; print('k8e-fetch-spark ready')"]
