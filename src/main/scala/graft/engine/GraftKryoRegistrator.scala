package graft.engine

import com.esotericsoftware.kryo.Kryo
import org.apache.spark.serializer.KryoRegistrator

/**
 * Kryo registration for every class the frontier ships through shuffles
 * or cached blocks. Unregistered Kryo prefixes each object graph with
 * full class-name strings — on the candidate shuffle (millions of rows
 * per wave) that is measurable extra bytes and hashing; registered ids
 * are varints.
 */
class GraftKryoRegistrator extends KryoRegistrator {
  override def registerClasses(kryo: Kryo): Unit = {
    kryo.register(classOf[Candidate])
    kryo.register(classOf[graft.model.UrlRecord])
    kryo.register(classOf[graft.model.FetchResult])
    kryo.register(classOf[graft.model.Span])
    kryo.register(classOf[graft.model.Document])
    kryo.register(classOf[graft.model.FollowUp])
    kryo.register(classOf[BucketSeen])
    kryo.register(classOf[BucketWave])
    kryo.register(classOf[graft.seen.CuckooFilter])
    kryo.register(classOf[graft.seen.SeenSet128])
    kryo.register(classOf[graft.seen.SeenChunk])
    kryo.register(classOf[Array[Int]])
    kryo.register(classOf[Array[graft.model.UrlRecord]])
    kryo.register(classOf[Array[graft.model.Span]])
    kryo.register(classOf[Array[String]])
    kryo.register(classOf[Array[Long]])
    kryo.register(classOf[Array[Byte]])
    kryo.register(classOf[scala.Tuple2[_, _]])
    kryo.register(classOf[scala.collection.immutable.Map[_, _]])
    kryo.register(scala.collection.immutable.Map.empty[String, String].getClass)
    kryo.register(scala.collection.immutable.Nil.getClass)
    kryo.register(classOf[scala.collection.immutable.List[_]])
    kryo.register(classOf[scala.collection.immutable.$colon$colon[_]])
  }
}
