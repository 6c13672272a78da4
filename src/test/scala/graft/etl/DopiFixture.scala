package graft.etl

import java.nio.charset.Charset
import java.nio.file.{Files, Path}

/** Synthesized DOPI-shaped CSV (FIXTURES.md §1c — the real file is an absent
  * large blob). 30 columns, Latin-1, headered, 'NA' null markers. Rows
  * exercise every quarantine class, the manual day-clamp fixes, the
  * placeholder-January date, author substring matching against users_mock
  * last names (incl. a Latin-1 'í'), the mixed-case species quirk, and
  * full-duplicate tolerance (README.md:19).
  */
object DopiFixture {

  /** The 16 consumed values; the other 14 columns are filler. */
  final case class Row(
    authors: String, nbnPoll: String, pollSpecies: String, caste: String,
    nbnPlant: String, plantSpecies: String, interactions: String,
    day: String, month: String, year: String, lat: String, lon: String,
    habitat: String, pollination: String, pollen: String, nectar: String)

  // Named rows so specs can assert per-case.
  val r1Valid = Row("Chapman, R. E.", "NHMSYS0000875423", "Apis mellifera", "worker",
    "NBNSYS0000004225", "Prunella vulgaris", "3", "15", "06", "2018",
    "51.5", "-0.12", "urban", "1", "Y", "N")
  val r2Dup = r1Valid // full duplicate — BOTH must survive
  val r3NoDate = Row("Chapman, R. E.", "NHMSYS0000875423", "Apis mellifera", "NA",
    "NBNSYS0000004225", "Prunella vulgaris", "NA", "NA", "NA", "NA",
    "NA", "NA", "NA", "NA", "NA", "NA")
  val r4Before = r1Valid.copy(day = "10", month = "05", year = "2010")
  val r5Clamp = r1Valid.copy(day = "31", month = "04", year = "2019") // → Apr 30
  val r6PlaceholderJan = Row("Botías, C.", "NHMSYS0000875215", "Bombus terrestris",
    "queen", "NBN123", "Trifolium repens", "2", "12", "NA", "2023",
    "52.2", "0.12", "suburban", "2", "N", "Y")
  val r7MixedCase = r1Valid.copy(day = "16", pollSpecies = "apis Mellifera")
  val r8NoAuthor = r1Valid.copy(authors = "Nobody Nomatch")
  val r9MissingSpecies = r1Valid.copy(plantSpecies = "NA")
  val r10BadLat = r1Valid.copy(lat = "91.5")
  val r11TwoFailures = r1Valid.copy(interactions = "three", lat = "999")
  val r12BadDay = r1Valid.copy(day = "32")
  val r13BadPollination = r1Valid.copy(pollination = "5")
  val r14BadPollen = r1Valid.copy(pollen = "X")

  val rows: Seq[Row] = Seq(r1Valid, r2Dup, r3NoDate, r4Before, r5Clamp,
    r6PlaceholderJan, r7MixedCase, r8NoAuthor, r9MissingSpecies, r10BadLat,
    r11TwoFailures, r12BadDay, r13BadPollination, r14BadPollen)

  val expectedValidStaging = 8    // r1-r8
  val expectedQuarantineEntries = 7 // r9..r14, r11 twice (lat + interactions)
  val expectedObservations = 6    // r1-r6 (r7 case quirk, r8 no author match)

  private def csvLine(r: Row): String = Seq(
    r.authors, "t", "j", "2020", "1", "doi", "m", "ps", "pls",
    r.nbnPoll, "cp", r.pollSpecies, r.caste, r.nbnPlant, "cpl",
    r.plantSpecies, r.interactions, r.day, r.month, r.year, "G", "GC",
    r.lat, r.lon, r.habitat, r.pollination, r.pollen, r.nectar, "rec", "url")
    .map(v => if (v.contains(",")) s""""$v"""" else v).mkString(",")

  /** Write the fixture as a Latin-1 CSV; returns the file path. */
  def write(dir: Path): String = {
    val header = Schemas.dopiCsv.mkString(",")
    val content = (header +: rows.map(csvLine)).mkString("\n")
    val f = dir.resolve("insect_observations.csv")
    Files.write(f, content.getBytes(Charset.forName("ISO-8859-1")))
    f.toString
  }

  /** Write the same rows split across `nFiles` headered CSVs in `dir`
    * (zero-padded names, so lexicographic file order == row order); returns
    * the directory path — exercises multi-file file+offset id assignment.
    */
  def writeSplit(dir: Path, nFiles: Int): String = {
    val header = Schemas.dopiCsv.mkString(",")
    val per = math.ceil(rows.size.toDouble / nFiles).toInt
    rows.grouped(per).zipWithIndex.foreach { case (g, i) =>
      val f = dir.resolve(f"obs_part$i%02d.csv")
      Files.write(f,
        (header +: g.map(csvLine)).mkString("\n").getBytes(Charset.forName("ISO-8859-1")))
    }
    dir.toString
  }
}
