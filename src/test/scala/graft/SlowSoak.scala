package graft

/** Tag for long-running soak tests excluded from the default `sbt
  * test` matrix (build.sbt filters `-l graft.SlowSoak`). Run them
  * explicitly:
  * `sbt "testOnly graft.streaming.StreamThroughputSpec -- -n graft.SlowSoak"`. */
object SlowSoak extends org.scalatest.Tag("graft.SlowSoak")
