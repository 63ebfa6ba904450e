package graft.core

import java.net.URI
import java.time.Instant
import java.util.UUID

import org.apache.spark.SparkConf
import org.apache.spark.serializer.KryoSerializer
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pin: every model class that can cross a Spark serialization
  * boundary must survive a Kryo round-trip (mirrors the reference's
  * `spark/src/test/.../KryoSpec.scala:10-33`, which exists because
  * `AnyVal` wrappers broke Kryo — reference `model.scala:38-40`). */
class KryoSpec extends AnyFunSuite with Matchers {

  private val kryo = new KryoSerializer(new SparkConf(false)).newInstance()

  private def roundTrip[T: scala.reflect.ClassTag](value: T): T =
    kryo.deserialize[T](kryo.serialize(value))

  test("model classes survive a Kryo round-trip") {
    val version = Version(Instant.now(), UUID.randomUUID())
    val partition = Partition(
      ColumnValue(PartitionColumn("date"), "2024-01-31"),
      ColumnValue(PartitionColumn("hour"), "07"))
    val table = TableDefinition(
      TableName("db", "t"), new URI("file:///tmp/db/t"),
      PartitionSchema(List(PartitionColumn("date"), PartitionColumn("hour"))),
      FileFormat.Parquet)

    roundTrip(version) shouldBe version
    roundTrip(partition) shouldBe partition
    roundTrip(table) shouldBe table
    roundTrip(PartitionedTableVersion(Map(partition -> version)): TableVersion) shouldBe
      PartitionedTableVersion(Map(partition -> version))
    roundTrip(SnapshotTableVersion(version): TableVersion) shouldBe
      SnapshotTableVersion(version)
  }

  test("commit-log records survive a Kryo round-trip") {
    import TableVersions._
    val update = TableUpdate(UserId("u"), UpdateMessage("m"), Instant.now(),
      List(
        TableOperation.InitTable(TableName("db", "t"), isSnapshot = false),
        TableOperation.AddPartitionVersion(
          Partition(PartitionColumn("d"), "1"), Version(Instant.now(), UUID.randomUUID()))))
    roundTrip(update) shouldBe update
  }
}
