package graft.core

import java.net.URI
import java.time.Instant
import java.util.UUID

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Render/parse pins for the domain model, mirroring the reference's
  * table-driven `ModelSpec` (`core/src/test/.../ModelSpec.scala:13-65`). */
class ModelSpec extends AnyFunSuite with Matchers {

  test("single-column partition renders in Hive path form") {
    Partition(PartitionColumn("date"), "2024-01-31").hivePath shouldBe "date=2024-01-31"
  }

  test("multi-column partition renders columns in order") {
    Partition(
      ColumnValue(PartitionColumn("event_date"), "2019-02-09"),
      ColumnValue(PartitionColumn("processed_date"), "2019-02-10")
    ).hivePath shouldBe "event_date=2019-02-09/processed_date=2019-02-10"
  }

  test("parse inverts render, with or without surrounding slashes") {
    val p = Partition(
      ColumnValue(PartitionColumn("a"), "1"),
      ColumnValue(PartitionColumn("b"), "x"))
    Partition.parse(p.hivePath) shouldBe Right(p)
    Partition.parse("/" + p.hivePath + "/") shouldBe Right(p)
  }

  test("parse splits each segment on the first '=' only") {
    Partition.parse("k=YWJjZA==") shouldBe
      Right(Partition(PartitionColumn("k"), "YWJjZA=="))
  }

  test("values that cannot round-trip the hivePath log encoding are rejected at construction") {
    // '/' would brick the durable log's replay (or re-parse as extra
    // columns); empty renders a segment parse rejects
    an[IllegalArgumentException] should be thrownBy ColumnValue(PartitionColumn("d"), "2024/01")
    an[IllegalArgumentException] should be thrownBy ColumnValue(PartitionColumn("d"), "")
    an[IllegalArgumentException] should be thrownBy PartitionColumn("a=b")
    an[IllegalArgumentException] should be thrownBy PartitionColumn("a/b")
    // '=' in VALUES is fine — parse splits on the first '=' only
    ColumnValue(PartitionColumn("k"), "YWJjZA==").value shouldBe "YWJjZA=="
  }

  test("parse rejects malformed segments") {
    Partition.parse("no-equals-here").isLeft shouldBe true
    Partition.parse("=value").isLeft shouldBe true
    Partition.parse("name=").isLeft shouldBe true
    Partition.parse("9bad=name").isLeft shouldBe true
    Partition.parse("").isLeft shouldBe true
  }

  test("a partition must have at least one column value") {
    an[IllegalArgumentException] should be thrownBy Partition(List.empty[ColumnValue])
  }

  test("resolvePath appends the Hive path under the table location") {
    val loc = new URI("file:///warehouse/db/t")
    // note: URI.resolve drops the empty authority (file:/// -> file:/);
    // both forms name the same path and Hadoop/NIO accept either
    Partition(PartitionColumn("date"), "2024-01-31").resolvePath(loc).toString shouldBe
      "file:/warehouse/db/t/date=2024-01-31/"
  }

  test("TableName round-trips through fromFullyQualified; identifiers only") {
    TableName.fromFullyQualified("db.t") shouldBe Right(TableName("db", "t"))
    TableName.fromFullyQualified("Sch_1.T_2") shouldBe Right(TableName("Sch_1", "T_2"))
    TableName.fromFullyQualified("nodot").isLeft shouldBe true
    TableName.fromFullyQualified(".t").isLeft shouldBe true
    TableName.fromFullyQualified("db.").isLeft shouldBe true
    // names are embedded in log-file paths and DDL: anything that could
    // escape the log dir or collide distinct tables onto one file is out
    TableName.fromFullyQualified("db.t.v1").isLeft shouldBe true
    TableName.fromFullyQualified("db.a/b").isLeft shouldBe true
    TableName.fromFullyQualified("../x.t").isLeft shouldBe true
    an[IllegalArgumentException] should be thrownBy TableName("db", "a/b")
    an[IllegalArgumentException] should be thrownBy TableName("d.b", "t")
  }

  test("snapshot tables are exactly those with the empty partition schema") {
    val loc = new URI("file:///tmp/t")
    TableDefinition(TableName("d", "t"), loc, PartitionSchema.snapshot, FileFormat.Parquet)
      .isSnapshot shouldBe true
    TableDefinition(TableName("d", "t"), loc,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Orc)
      .isSnapshot shouldBe false
  }
}

/** Property tests pinning the version-label and path codecs
  * (reference `VersionSpec.scala:49-54`, `VersionPathsSpec.scala:12-44`). */
class VersionCodecSpec extends AnyFunSuite with Matchers {

  private val genVersion: Gen[Version] = for {
    epochSec <- Gen.choose(0L, 4102444800L) // 1970..2100
    nanos <- Gen.choose(0L, 999999999L)
    hi <- Gen.long
    lo <- Gen.long
  } yield Version(Instant.ofEpochSecond(epochSec, nanos), new UUID(hi, lo))

  /** Deterministic generator sampling (no scalatest/scalacheck bridge in the
    * offline cache). */
  private def forAll[A](g: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  test("property: label render/parse round-trips") {
    forAll(genVersion) { v =>
      Version.parse(v.label) shouldBe Right(v)
    }
  }

  test("the Unversioned sentinel round-trips through its label") {
    Version.parse(Version.Unversioned.label) shouldBe Right(Version.Unversioned)
  }

  test("parse rejects junk") {
    Version.parse("not-a-label").isLeft shouldBe true
    Version.parse("20240101-120000.000000000-not-a-uuid").isLeft shouldBe true
  }

  test("property: pathFor / parseVersion round-trips for snapshot paths") {
    val loc = new URI("file:///warehouse/db/t")
    forAll(genVersion) { v =>
      VersionPaths.parseVersion(VersionPaths.pathFor(loc, v)) shouldBe v
    }
  }

  test("property: pathFor / parseVersion round-trips for partition paths") {
    val loc = new URI("file:///warehouse/db/t")
    val part = Partition(PartitionColumn("date"), "2024-01-31")
    forAll(genVersion) { v =>
      val path = VersionPaths.pathFor(loc, part, v)
      VersionPaths.parseVersion(path) shouldBe v
      VersionPaths.versionedToBasePath(path) shouldBe part.resolvePath(loc)
    }
  }

  test("property: partition hivePath render/parse round-trips, including '=' in values") {
    val genValue = Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.alphaNumStr.suchThat(_.nonEmpty).map(_ + "=="), // base64-ish tail
      Gen.choose(1, 28).map(d => f"2024-01-$d%02d"))
    val genPartition = for {
      n <- Gen.choose(1, 3)
      names <- Gen.listOfN(n, Gen.identifier.suchThat(_.nonEmpty))
      values <- Gen.listOfN(n, genValue)
    } yield Partition(names.zip(values).map { case (k, v) =>
      ColumnValue(PartitionColumn(k), v)
    })
    forAll(genPartition, n = 300) { p =>
      Partition.parse(p.hivePath) shouldBe Right(p)
    }
  }

  test("Unversioned maps to the bare table path (pre-existing data keeps its location)") {
    val loc = new URI("file:///warehouse/db/t")
    VersionPaths.pathFor(loc, Version.Unversioned).toString shouldBe "file:///warehouse/db/t/"
    VersionPaths.parseVersion(new URI("file:///warehouse/db/t/")) shouldBe Version.Unversioned
  }
}
