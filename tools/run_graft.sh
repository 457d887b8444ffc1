#!/bin/bash
# Run a graft main with the build.sbt JDK17 opens, bypassing sbt startup.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java $OPENS -Xmx8g -Xms8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" "$@"
