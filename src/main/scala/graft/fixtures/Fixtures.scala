package graft.fixtures

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.ops.ProviderModels

/** Deterministic test fixtures mirroring the reference's seed data
  * (FIXTURES.md; reference `datagen.py`, `sample.csv`, Debezium topics).
  * Reference uses unseeded `random`; we fix seed=graft so every run and
  * every test sees identical bytes.
  */
object Fixtures {

  /** The 8 care sites — `datagen.py:46-55`, verbatim values. */
  val careSites: Seq[(Int, String, String)] = Seq(
    (1, "City Hospital", "CSH01"), (2, "Village Clinic", "VCL01"),
    (3, "Metro Medical Center", "MMC01"), (4, "Suburban Health", "SH01"),
    (5, "North Health Institute", "NHI01"), (6, "Eastside Clinic", "EC01"),
    (7, "Downtown Health", "DH01"), (8, "Westside Family Practice", "WFP01"))

  def careSiteDf(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(careSites.map { case (i, n, v) => Row(i, n, v) }),
      ProviderModels.careSiteSchema)

  private val firstNames = Seq("John", "Jane", "Alex", "Emily", "Chris",
    "Katie", "Michael", "Laura", "Robert", "Sarah")
  private val lastNames = Seq("Doe", "Smith", "Johnson", "Lee", "Brown",
    "Davis", "Miller", "Wilson", "Moore", "Taylor")
  private val specialties = Seq("Cardiology", "Pediatrics", "Neurology",
    "Oncology", "Dermatology", "Orthopedics", "Internal Medicine",
    "General Practice")

  /** One provider row as a Debezium after-image JSON object (FIXTURES.md §3
    * envelope; field order fixed for byte determinism). */
  private def afterJson(id: Int, name: String, npi: String, specialty: String,
                        site: String): String = {
    val initial = name.head
    s"""{"provider_id": $id, "provider_name": "$name", "npi": "$npi", """ +
      s""""specialty": "$specialty", "care_site": "$site", """ +
      s""""provider_source_value": "$initial${name.split(' ').last}", """ +
      s""""specialty_source_value": "$specialty", """ +
      s""""provider_id_source_value": "$initial-$npi"}"""
  }

  def envelope(after: Option[String], op: String, tsMs: Long,
               table: String = "provider"): String = {
    val a = after.getOrElse("null")
    s"""{"payload": {"before": null, "after": $a, "op": "$op", """ +
      s""""ts_ms": $tsMs, "source": {"db": "test", "schema": "public", "table": "$table"}}}"""
  }

  final case class Provider(id: Int, name: String, npi: String,
                            specialty: String, site: String)

  /** Deterministic provider set (seeded; unique NPIs like `datagen.py:167`). */
  def providers(n: Int, seed: Long = 42L): Seq[Provider] = {
    val rnd = new scala.util.Random(seed)
    val seen = scala.collection.mutable.Set[String]()
    (1 to n).map { id =>
      var npi = ""
      do npi = (1 to 10).map(_ => rnd.nextInt(10)).mkString
      while (!seen.add(npi))
      Provider(id,
        s"${firstNames(rnd.nextInt(10))} ${lastNames(rnd.nextInt(10))}",
        npi,
        specialties(rnd.nextInt(specialties.size)),
        careSites(rnd.nextInt(careSites.size))._2)
    }
  }

  /** Emit a Debezium JSONL topic dump with create + update + delete +
    * out-of-order events (FIXTURES.md §3: "a mix of c/u/d ops and
    * out-of-order ts_ms per key"). Semantics encoded:
    *   - every provider gets a `c` at t0+id;
    *   - ids ≡ 0 (mod 5): an `u` renaming to "Updated <name>" at t0+id+1000;
    *   - ids ≡ 0 (mod 5): ALSO a stale out-of-order `u` ("Stale <name>")
    *     with EARLIER ts than the fresh update — must lose latest-per-key;
    *   - ids ≡ 0 (mod 7): a `d` tombstone (after=null) — must be dropped
    *     by the raw filter, so deletes never reach the lake (ST2). */
  def providerCdcJsonl(path: String, n: Int, t0Ms: Long = 1757700000000L,
                       seed: Long = 42L): Seq[Provider] = {
    val ps = providers(n, seed)
    val lines = ps.flatMap { p =>
      val create = envelope(
        Some(afterJson(p.id, p.name, p.npi, p.specialty, p.site)), "c", t0Ms + p.id)
      val updates = if (p.id % 5 == 0) Seq(
        envelope(Some(afterJson(p.id, s"Updated ${p.name}", p.npi, p.specialty, p.site)),
          "u", t0Ms + p.id + 1000),
        envelope(Some(afterJson(p.id, s"Stale ${p.name}", p.npi, p.specialty, p.site)),
          "u", t0Ms + p.id + 500)) else Nil
      val deletes = if (p.id % 7 == 0)
        Seq(envelope(None, "d", t0Ms + p.id + 2000)) else Nil
      create +: (updates ++ deletes)
    }
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    ps
  }

  /** The expected post-merge name for a provider id under the fixture's
    * event mix — oracle for CDC merge tests. */
  def expectedName(p: Provider): String =
    if (p.id % 5 == 0) s"Updated ${p.name}" else p.name

  /** sample.csv verbatim-in-spirit (FIXTURES.md §2): 15 rows, 8 VARCHAR
    * cols, deliberate bad data — duplicate ProviderID 001 with 3 name
    * variants, literal "NULL" NPI and ProviderName, abbreviated specialties
    * and site names, zero-padded IDs. */
  val sampleCsv: String =
    """ProviderName,ProviderID,NPI,Specialty,SiteName,SourceID,SpecSource,IDSource
      |John Doe,001,1234567890,Cardiology,City Hospital,JDoe,Cardiology,J-1234567890
      |Alex Lee,002,2345678901,Peds,Village Clinic,ALee,Pediatrics,A-2345678901
      |Dr. J. Doe,001,1234567890,Cardiology,City Hospital,JDoe,Cardiology,J-1234567890
      |Emily Brown,003,3456789012,Neuro,Metro Med,EBrown,Neurology,E-3456789012
      |Jane S.,004,NULL,Derma,Suburban Health,JSmith,Dermatology,J-NONPI
      |Dr. John Doe,001,1234567890,Cardiology,City Hospital,JDoe,Cardiology,J-1234567890
      |Chris Davis,005,5678901234,Ortho,North Health Inst,CDavis,Orthopedics,C-5678901234
      |NULL,006,6789012345,Oncology,Eastside Clinic,KMiller,Oncology,K-6789012345
      |Katie Miller,007,7890123456,Int Med,Downtown Health,KMiller,Internal Medicine,K-7890123456
      |Michael Wilson,008,8901234567,Cardiology,Westside Family,MWilson,Cardiology,M-8901234567
      |Laura Moore,009,9012345678,Derma,City Hospital,LMoore,Dermatology,L-9012345678
      |Robert Taylor,010,0123456789,Neurology,Village Clinic,RTaylor,Neurology,R-0123456789
      |Sarah Johnson,011,1122334455,Peds,Metro Med,SJohnson,Pediatrics,S-1122334455
      |Dr. A. Smith,012,2233445566,Dermatology,Suburban Health,ASmith,Dermatology,A-2233445566
      |Test Provider,013,3344556677,Int Med,North Health Inst,TProv,Internal Medicine,T-3344556677""".stripMargin

  def writeSampleCsv(path: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), sampleCsv.getBytes(StandardCharsets.UTF_8))
  }
}
