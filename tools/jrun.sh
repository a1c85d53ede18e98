#!/usr/bin/env bash
# Direct-java launcher for graft mains (skips sbt; classes must be compiled).
# Usage: tools/jrun.sh <MainClass> [args...]   (env vars pass through)
set -uo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
    java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
    sun.util.calendar; do echo --add-opens java.base/$p=ALL-UNNAMED; done)
MAIN=$1; shift
exec java -Xmx16g $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$PWD/target/scala-2.13/classes:/opt/spark/jars/*" \
  "graft.$MAIN" "$@"
