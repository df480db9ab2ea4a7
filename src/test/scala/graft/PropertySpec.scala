package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.engine.{VotingQueries => VQ}
import graft.sources.VotingGen

/** Property-based invariants (SURVEY §5.3) over ScalaCheck-generated
  * generator parameters: percentages sum to ~100, rank is a
  * permutation, cumulative trends are monotone, dedup is idempotent.
  * (Plain scalacheck Gen sampled with a fixed RNG seed; the
  * scalatestplus bridge isn't on the classpath.)
  */
class PropertySpec extends SparkSpec {

  private val cases: Seq[(Int, Long)] =
    Gen.listOfN(5, Gen.zip(Gen.choose(20, 300), Gen.choose(0L, 10000L)))
      .apply(Gen.Parameters.default, Seed(42L)).get

  private def forAllCases(body: (Int, Long) => Unit): Unit =
    cases.foreach { case (n, seed) => body(n, seed) }

  test("Q2 percentages sum to ~100 and rank is a 1..k permutation") {
    forAllCases { (n, seed) =>
      val t = VotingGen.generate(spark, nVoters = n, seed = seed)
      val rows = VQ.votesByCandidate(t).collect()
      val pctSum = rows.map(_.getAs[Double]("percentage")).sum
      assert(math.abs(pctSum - 100.0) < 0.05)
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rows.length))
    }
  }

  test("Q3 cumulative totals are monotone non-decreasing per candidate") {
    forAllCases { (n, seed) =>
      val t = VotingGen.generate(spark, nVoters = n, seed = seed)
      VQ.historicalTrends(t).orderBy("vote_time").collect()
        .groupBy(_.getAs[String]("candidate_name"))
        .foreach { case (_, rs) =>
          val xs = rs.map(_.getAs[Long]("total_votes")).toSeq
          assert(xs === xs.sorted)
        }
    }
  }

  test("gender + age distribution percentages each sum to ~100") {
    forAllCases { (n, seed) =>
      val t = VotingGen.generate(spark, nVoters = n, seed = seed)
      val g = VQ.genderDistribution(t).collect().map(_.getAs[Double]("percentage")).sum
      val a = VQ.ageDistribution(t).collect().map(_.getAs[Double]("percentage")).sum
      assert(math.abs(g - 100.0) < 0.05)
      assert(math.abs(a - 100.0) < 0.05)
    }
  }

  test("unique_voter dedup is idempotent and keeps one row per voter") {
    import org.apache.spark.sql.functions._
    forAllCases { (n, seed) =>
      val t = VotingGen.generate(spark, nVoters = n, seed = seed)
      // duplicate the stream (simulated redelivery), then dedup
      val doubled = t.vote.union(t.vote)
      val once = doubled.dropDuplicates("voter_id")
      val twice = once.dropDuplicates("voter_id")
      assert(once.count() === n.toLong)
      assert(twice.count() === once.count())
      assert(once.groupBy(col("voter_id")).count().filter("count > 1").count() === 0)
    }
  }

  test("text normalization is idempotent with a closed output alphabet") {
    import spark.implicits._
    val noisy = Gen.listOfN(60, Gen.listOfN(12,
        Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '!', '.', '\t', 'Ü', '@'))
      ).map(_.mkString))
      .apply(Gen.Parameters.default, Seed(7L)).get
    val out = noisy.toDF("text")
      .select(graft.operators.TextAnalysis.normalizedText($"text").as("n1"))
      .withColumn("n2", graft.operators.TextAnalysis.normalizedText($"n1"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (n1, n2) =>
      assert(n1 === n2, s"not idempotent: '$n1' -> '$n2'")
      assert(n1.matches("[a-z0-9 ]*") && !n1.contains("  ") &&
        n1 == n1.trim, s"alphabet/spacing violated: '$n1'")
    }
  }

  test("url canonicalization is idempotent and drops scheme/www/query/fragment") {
    import spark.implicits._
    val urls = for {
      scheme <- Seq("https://", "HTTP://", "")
      www <- Seq("www.", "")
      q <- Seq("?a=1&b=2", "#frag", "")
      slash <- Seq("/", "")
    } yield s"${scheme}${www}Example.ORG/Path/7$slash$q"
    val out = urls.toDF("url")
      .select(graft.operators.Redaction.canonicalUrl($"url").as("c1"))
      .withColumn("c2", graft.operators.Redaction.canonicalUrl($"c1"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (c1, c2) =>
      assert(c1 === "example.org/Path/7", s"unexpected canonical: '$c1'")
      assert(c1 === c2, s"not idempotent: '$c1' -> '$c2'")
    }
  }

  test("trigram novelty equals a driver recompute of first-occurrence counts") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val texts = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val grams = texts.toSeq.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => id -> s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
    }
    val firstDoc = grams.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val expect = grams.groupBy(_._1).map { case (id, gs) =>
      val novel = gs.count(g => firstDoc(g._2) == id).toLong
      id -> ((gs.length.toLong, novel, novel * 1000000L / gs.length))
    }
    val got = graft.operators.TextAnalysis.novelty(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
    // the corpus has repeated boilerplate, so non-trivial both ways
    assert(got.values.exists(_._3 < 1000000L), "some doc repeats earlier content")
    assert(got.values.exists(_._3 == 1000000L), "some doc is fully novel")
  }
}
