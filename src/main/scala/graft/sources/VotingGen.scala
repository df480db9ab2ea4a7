package graft.sources

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.SparkSession

import graft.engine.{VotingQueries, VotingTables}

/** Deterministic, seeded stand-in for the reference's randomuser.me
  * ingest (`src/data_generator.py:104-130`; no network in this
  * environment — SURVEY §2.3). Emits the exact table shapes of
  * FIXTURES.md §A: 3 candidates, N voters, one vote per voter
  * (the `unique_voter` constraint, `src/setup_database.py:105`).
  *
  * Vote weighting is the reference's cumulative-walk with fall-through
  * to the last candidate (`src/data_generator.py:165-181`, quirk
  * §2.5-5): nominal [0.22, 0.40, 0.35] sums to 0.97, so effective
  * shares are 22/40/38.
  */
object VotingGen {

  final case class Candidate(candidate_id: String, first_name: String,
    last_name: String, dob: String, age: Int, gender: String, party: String,
    biography: String, img_url: String)

  final case class Voter(voter_id: String, first_name: String, last_name: String,
    dob: String, age: Int, gender: String, nationality: String,
    registration_number: String, address_street: String, address_city: String,
    address_state: String, address_country: String, address_postcode: String,
    email: String, phone: String)

  final case class Vote(vote_id: String, voter_id: String, candidate_id: String,
    voted_at: Timestamp, vote: Int)

  private val states = Seq("Texas", "Ohio", "Maine", "California", "Florida",
    "Nevada", "Oregon", "Georgia", "Vermont", "Arizona", "Colorado", "Iowa")
  private val firstNames = Seq("Alice", "Bob", "Carol", "David", "Emma",
    "Frank", "Grace", "Henry", "Ivy", "Jack", "Karen", "Liam")
  private val lastNames = Seq("Smith", "Jones", "White", "Brown", "Davis",
    "Miller", "Wilson", "Moore", "Taylor", "Thomas", "Lee", "Clark")

  private def uuid(rnd: Random): String =
    f"${rnd.nextLong()}%016x-${rnd.nextInt(0xffff)}%04x"

  /** Reference weighting (`src/data_generator.py:165-181`): cumulative
    * walk over [0.22, 0.40, 0.35]; r > 0.97 falls through to the last
    * candidate.
    */
  private[graft] def weightedIndex(r: Double): Int = {
    val weights = Seq(0.22, 0.40, 0.35)
    var cum = 0.0
    for ((w, i) <- weights.zipWithIndex) {
      cum += w
      if (r <= cum) return i
    }
    weights.size - 1
  }

  /** Generate the three tables. Votes are spaced `voteIntervalSec`
    * apart from `start` so date_trunc hour/minute queries are
    * non-trivial (FIXTURES.md §A.3 asks for ≥3 hours).
    */
  def generate(spark: SparkSession, nVoters: Int = 2000, seed: Long = 42L,
      start: Timestamp = Timestamp.valueOf("2024-05-01 08:00:00"),
      voteIntervalSec: Int = 7): VotingTables = {
    import spark.implicits._
    val rnd = new Random(seed)

    val candidates = VotingQueries.parties.zipWithIndex.map { case (party, i) =>
      Candidate(uuid(rnd), firstNames(i), lastNames(i),
        dob = s"${1970 + i}-03-0${i + 1}", age = 32 + 9 * i,
        gender = if (i % 2 == 0) "male" else "female", party = party,
        biography = s"A dedicated public servant of the $party.",
        img_url = s"https://example.invalid/candidate_$i.png")
    }

    val voters = (0 until nVoters).map { i =>
      val age = 18 + rnd.nextInt(43)
      val gender = if (rnd.nextBoolean()) "male" else "female"
      Voter(
        voter_id = uuid(rnd),
        first_name = firstNames(rnd.nextInt(firstNames.size)),
        last_name = lastNames(rnd.nextInt(lastNames.size)),
        dob = s"${2024 - age}-06-15", age = age, gender = gender,
        nationality = "US",
        registration_number = f"REG$i%08d",
        address_street = s"${100 + rnd.nextInt(900)} Main St",
        address_city = s"City${rnd.nextInt(40)}",
        address_state = states(rnd.nextInt(states.size)),
        address_country = "United States",
        address_postcode = f"${10000 + rnd.nextInt(89999)}%05d",
        email = s"voter$i@example.invalid",
        phone = f"555-${rnd.nextInt(10000)}%04d")
    }

    val votes = voters.zipWithIndex.map { case (v, i) =>
      val c = candidates(weightedIndex(rnd.nextDouble()))
      Vote(uuid(rnd), v.voter_id, c.candidate_id,
        new Timestamp(start.getTime + i.toLong * voteIntervalSec * 1000L), 1)
    }

    VotingTables(
      candidate = candidates.toDF(),
      voter = voters.toDF(),
      vote = votes.toDF())
  }
}
