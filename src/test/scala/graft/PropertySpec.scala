package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming.{mergeEvent, SessionSpan}

/** Property-based invariants (ScalaCheck) for the pure algorithmic cores
  * where an example-based spec can't sweep the input space: the streaming
  * session merge (order-insensitivity is what makes late arrivals exact),
  * cadence parsing, URL building, and scaffold naming.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def fold(times: Seq[Long], gap: Long): Seq[SessionSpan] =
    times.foldLeft(Seq.empty[SessionSpan])((acc, t) => mergeEvent(acc, t, gap))

  test("mergeEvent: arrival order never changes the final sessions") {
    // THE streaming-sessionize correctness core: late/out-of-order arrivals
    // across micro-batches must converge to the batch answer.
    val gen = for {
      times <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 2000L))
      gap <- Gen.chooseNum(1L, 300L)
      shuffled <- Gen.const(scala.util.Random.shuffle(times))
    } yield (times, shuffled, gap)
    check(Prop.forAll(gen) { case (times, shuffled, gap) =>
      fold(times.sorted, gap) == fold(shuffled, gap)
    })
  }

  test("mergeEvents == iterated mergeEvent for any batch split") {
    // the batched sweep IS the per-event fold: split the event sequence
    // into arbitrary micro-batches, feed each through mergeEvents, and the
    // trajectory must match folding every event one at a time
    import graft.streaming.Streaming.mergeEvents
    val gen = for {
      times <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 2000L))
      gap <- Gen.chooseNum(1L, 300L)
      cut <- Gen.chooseNum(0, times.length)
    } yield (times, gap, cut)
    check(Prop.forAll(gen) { case (times, gap, cut) =>
      val (b1, b2) = times.splitAt(cut)
      val batched = mergeEvents(mergeEvents(Seq.empty, b1.toArray, gap),
        b2.toArray, gap)
      batched == fold(times, gap)
    })
  }

  test("mergeEvent: spans are disjoint, gap-separated, and count every event") {
    val gen = for {
      times <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 2000L))
      gap <- Gen.chooseNum(1L, 300L)
    } yield (times, gap)
    check(Prop.forAll(gen) { case (times, gap) =>
      val spans = fold(times, gap)
      val ordered = spans.sortBy(_.start)
      val gapSeparated = ordered.sliding(2).forall {
        case Seq(a, b) => b.start - a.end > gap
        case _         => true
      }
      val countsMatch = spans.map(_.n).sum == times.length
      val boundsHit = ordered.head.start == times.min &&
        ordered.last.end == times.max
      val withinSpan = times.forall(t => spans.exists(s =>
        t >= s.start && t <= s.end))
      gapSeparated && countsMatch && boundsHit && withinSpan
    })
  }

  test("parseCadenceMillis: every unit scales its amount exactly") {
    import graft.functions.TimeFns.parseCadenceMillis
    val gen = for {
      n <- Gen.chooseNum(1, 10000)
      (suffix, ms) <- Gen.oneOf(Seq(("ms", 1L), ("s", 1000L), ("m", 60000L),
        ("min", 60000L), ("h", 3600000L), ("d", 86400000L)))
    } yield (n, suffix, ms)
    check(Prop.forAll(gen) { case (n, suffix, ms) =>
      parseCadenceMillis(s"$n$suffix") == n * ms
    })
  }

  test("buildUrl: every param lands percent-encoded; existing query joins with &") {
    import graft.sources.Http.buildUrl
    val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val gen = for {
      base <- token.map(t => s"http://h/$t")
      withQuery <- Gen.oneOf(true, false)
      params <- Gen.listOf(Gen.zip(token, token))
    } yield (if (withQuery) s"$base?q=1" else base, withQuery, params)
    check(Prop.forAll(gen) { case (url, hadQuery, params) =>
      val built = buildUrl(url, params)
      val joinedRight = params.isEmpty ||
        built.startsWith(url + (if (hadQuery) "&" else "?"))
      joinedRight && params.forall { case (k, v) => built.contains(s"$k=$v") }
    })
  }

  test("scaffold names: valid ids map to a legal class; anything else throws") {
    import graft.plugins.Scaffold.names
    val valid = for {
      head <- Gen.alphaLowerChar
      tail <- Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar,
        Gen.const('_'), Gen.const('-')))
    } yield (head +: tail).mkString
    check(Prop.forAll(valid) { raw =>
      val (pkg, cls) = names(raw)
      !pkg.contains("-") && cls.matches("[A-Z][A-Za-z0-9]*Plugin") &&
        pkg == raw.replace('-', '_')
    })
    val invalid = Gen.oneOf("", "Upper", "9start", "sp ace", "-lead", "ünï")
    check(Prop.forAll(invalid) { raw =>
      Prop.throws(classOf[IllegalArgumentException])(names(raw))
    }, n = 20)
  }

  test("artifact graph: random projects topo-sort consistently with dependentsOf") {
    import graft.pipeline.{ArtifactGraph, Config}
    // random well-formed projects: N sources/streams, a dataset whose
    // vectors ride a random stream subset, a random mix of declared tasks
    val gen = for {
      nStreams <- Gen.chooseNum(1, 4)
      scaledIdx <- Gen.chooseNum(0, nStreams - 1)
      ticksOn <- Gen.someOf(0 until nStreams)
      withMeta <- Gen.oneOf(true, false)
      withCov <- Gen.oneOf(true, false)
    } yield {
      val sources = (0 until nStreams).map(i =>
        s"  - id: src$i\n    loader: { transport: fs, path: t$i.parquet, reader: { format: parquet } }")
      val streams = (0 until nStreams).map(i =>
        s"  - id: s$i\n    from: { source: src$i }\n    partition_by: [k]")
      val vectors = (0 until nStreams).map(i =>
        s"    - { id: v$i, stream: s$i, field: x, scale: ${i == scaledIdx} }")
      val tasks =
        Seq("  - { id: sc, task: scaler }") ++
          (if (withMeta) Seq("  - { id: meta, task: metadata }") else Nil) ++
          (if (withCov) Seq("  - { id: cov, task: coverage, threshold: 0.5, stage: assembled }") else Nil) ++
          ticksOn.map(i => s"  - { id: ticks$i, task: ticks, stream: s$i, grid_by: [k] }")
      Config.parseProject(
        s"""sources:
           |${sources.mkString("\n")}
           |streams:
           |${streams.mkString("\n")}
           |dataset:
           |  sample: { cadence: 1h, keys: [k] }
           |  features:
           |${vectors.mkString("\n")}
           |tasks:
           |${tasks.mkString("\n")}
           |""".stripMargin)
    }
    check(Prop.forAll(gen) { project =>
      val deps = ArtifactGraph.dependencies(project)
      val order = ArtifactGraph.topoOrder(project, deps)
      // topo order: every dependency precedes its dependent; one slot per task
      val pos = order.zipWithIndex.toMap
      val topoOk = deps.forall { case (k, ds) => ds.forall(d => pos(d) < pos(k)) }
      val complete = order.sorted == project.tasks.map(_.id).sorted
      // dependentsOf inverts the edge relation transitively
      val dependentsOk = project.tasks.map(_.id).forall { k =>
        val dependents = ArtifactGraph.dependentsOf(deps, Set(k))
        val direct = deps.collect { case (d, ds) if ds.contains(k) => d }.toSet
        direct.subsetOf(dependents) && !dependents.contains(k)
      }
      topoOk && complete && dependentsOk
    }, n = 100)
  }
}
