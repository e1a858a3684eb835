# Sourced helper: the Spark 4.x on JDK 17 module opens, factored out of
# bench_scale_probe.sh / sweep_sf1_heavy.sh / sweep_sf10_spot.sh so the
# four copies cannot drift (ADVICE r14). This is the shell twin of
# build.sbt's `jdk17AddOpens` (same package list, same rationale: bare
# `java -cp` lacks what spark-submit/sbt inject; without them the MLlib
# rows — Kryo reflecting ByteBuffer/SerializedLambda — fail).
#
# Usage:  . scripts/jdk17_opens.sh   # defines $OPENS
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
