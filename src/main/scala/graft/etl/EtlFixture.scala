package graft.etl

import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.{Files, Path}
import java.time.LocalDate

/** Deterministic, size-parameterized generator of the three EP1 inputs
  * (institutions / users / DOPI-shaped observations CSVs), used by
  * [[graft.Bench]] to time the EP1+EP2 pipeline end-to-end at a
  * benchmarkable scale — the spec-level fixture
  * (src/test .../DopiFixture.scala) stays tiny and case-exact.
  *
  * Every value is a pure function of the row index (no RNG), so repeated
  * bench rounds measure identical inputs. The mix mirrors the reference's
  * data shape: mostly-valid rows, ~1-3% per quarantine class (bad range /
  * bad count / missing species), placeholder-January and null-date rows,
  * full duplicates every 100th row (README.md:19 — both must survive),
  * multi-version users exercising SCD2 end-dating and priority as-of
  * resolution, and fixed-width author last names so the substring
  * theta-join matches exactly one user per observation.
  */
object EtlFixture {

  final case class FixturePaths(institutions: String, users: String, observationsDir: String)

  private val SubTypes = Seq("Free", "Pro", "HiveMind", "FieldScout", "BeeWatch+")
  private val epoch = LocalDate.of(2015, 1, 1)

  /** Fixed-width (so never a substring of one another) author last names. */
  private def lastName(i: Int): String = f"Name$i%05dx"

  def write(dir: Path, nObs: Int): FixturePaths = {
    val nUsers = math.max(50, nObs / 50)

    val instLines = "institution,city,county" +:
      (0 until 40).map(i => s"Institute $i,City${i % 25},County${i % 8}")
    val instFile = dir.resolve("institutions.csv")
    Files.write(instFile, instLines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    // every third user gets a second staging row 400 days later: a new
    // institution + subscription type → two SCD2 versions of each dimension
    val userLines = (0 until nUsers).flatMap { i =>
      val join = epoch.plusDays(i % 1500)
      def row(affStart: LocalDate, inst: Int, sub: Int, subStart: LocalDate) = Seq(
        s"A. B. ${lastName(i)}", s"user$i", s"user$i@example.org",
        s"Institute $inst", affStart.toString, s"City${i % 25}", s"County${i % 8}",
        SubTypes(sub), subStart.toString, join.toString).mkString(",")
      val v1 = row(join, i % 40, i % 5, join)
      if (i % 3 == 0) Seq(v1, row(join.plusDays(400), (i + 7) % 40, (i + 1) % 5, join.plusDays(400)))
      else Seq(v1)
    }
    val usersFile = dir.resolve("users.csv")
    Files.write(usersFile,
      (Schemas.usersCsv.mkString(",") +: userLines).mkString("\n").getBytes(StandardCharsets.UTF_8))

    def obsLine(j: Int): String = {
      val lat = if (j % 97 == 0) "95.5" else ((500 + j % 200).toDouble / 10).toString
      val lon = ((-50 + j % 300).toDouble / 10).toString
      val inter = if (j % 89 == 0) "lots" else (j % 9).toString
      val plant = if (j % 83 == 0) "NA" else s"Plantago forma${j % 400}"
      val month = if (j % 41 == 0) "NA" else (1 + j % 12).toString
      val year = if (j % 43 == 0) "NA" else (2015 + j % 8).toString
      Seq(
        s"Field note by ${lastName(j % nUsers)}",
        "t", "j", "2020", "1", "doi", "m", "ps", "pls",
        f"NBNP${j % 500}%04d", "cp",
        s"Bombus varietas${j % 300}",
        Seq("worker", "queen", "drone", "NA")(j % 4),
        f"NBNL${j % 400}%04d", "cpl",
        plant,
        inter,
        (1 + j % 28).toString, month, year,
        "G", "GC",
        lat, lon,
        Seq("urban", "meadow", "forest", "farmland", "NA")(j % 5),
        (1 + j % 4).toString,
        if (j % 2 == 0) "Y" else "N",
        if (j % 3 == 0) "Y" else "N",
        "rec", "url").mkString(",")
    }
    val obsDir = dir.resolve("observations")
    Files.createDirectories(obsDir)
    val header = Schemas.dopiCsv.mkString(",")
    val all = (0 until nObs).flatMap(j =>
      if (j % 100 == 0) Seq(obsLine(j), obsLine(j)) else Seq(obsLine(j)))
    val nFiles = 4
    val per = math.max(1, math.ceil(all.size.toDouble / nFiles).toInt)
    all.grouped(per).zipWithIndex.foreach { case (g, k) =>
      Files.write(obsDir.resolve(f"observations_$k%02d.csv"),
        (header +: g).mkString("\n").getBytes(Charset.forName("ISO-8859-1")))
    }
    FixturePaths(instFile.toString, usersFile.toString, obsDir.toString)
  }
}
