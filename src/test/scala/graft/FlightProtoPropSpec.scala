package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.flight.FlightProto._
import graft.flight.{FlightResult, FlightServer}

/** Property tests for the hand-rolled Flight protobuf codec and IPC
  * framing — randomized payloads (empty, binary, multi-KB) must survive
  * encode → decode byte-exactly, and splitIpc/encapsulate must be exact
  * inverses; a hand-written wire codec earns its keep only under inputs
  * nobody thought of.
  */
class FlightProtoPropSpec extends AnyFunSuite {

  import TestProps.forAll

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 4096).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte)))

  test("property: Ticket round-trips arbitrary bytes") {
    forAll(bytesGen) { b =>
      assert(Ticket.fromBytes(Ticket(b).toBytes).ticket.toSeq == b.toSeq)
    }
  }

  test("property: FlightData round-trips arbitrary header/body pairs") {
    forAll(Gen.zip(bytesGen, bytesGen)) { case (h, b) =>
      val back = FlightData.fromBytes(FlightData(h, b).toBytes)
      assert(back.dataHeader.toSeq == h.toSeq)
      assert(back.dataBody.toSeq == b.toSeq)
    }
  }

  test("property: FlightInfo round-trips with arbitrary counts") {
    val infoGen = for {
      schema <- bytesGen
      cmd <- bytesGen
      nEp <- Gen.chooseNum(0, 4)
      tickets <- Gen.listOfN(nEp, bytesGen)
      records <- Gen.oneOf(Gen.const(-1L), Gen.chooseNum(0L, Long.MaxValue))
      total <- Gen.oneOf(Gen.const(-1L), Gen.chooseNum(0L, Long.MaxValue))
    } yield FlightInfo(schema, FlightDescriptor(FlightDescriptor.CMD, cmd),
      tickets.map(t => FlightEndpoint(Ticket(t))), records, total)
    forAll(infoGen) { info =>
      val back = FlightInfo.fromBytes(info.toBytes)
      assert(back.schema.toSeq == info.schema.toSeq)
      assert(back.descriptor.cmd.toSeq == info.descriptor.cmd.toSeq)
      assert(back.endpoints.map(_.ticket.ticket.toSeq) ==
        info.endpoints.map(_.ticket.ticket.toSeq))
      assert(back.totalRecords == info.totalRecords)
      assert(back.totalBytes == info.totalBytes)
    }
  }

  test("property: encapsulate pads metadata to 8 bytes; splitIpc inverts it") {
    // foreign (pyarrow/Airport) servers may ship UNPADDED flatbuffer
    // headers — encapsulate must produce a well-formed IPC message (body
    // 8-byte aligned, written length includes padding) for ANY header
    // length, and an already-padded Spark-origin header must round-trip
    // byte-for-byte
    forAll(Gen.zip(bytesGen.suchThat(_.nonEmpty), bytesGen)) { case (h, b) =>
      val chunk = FlightResult.encapsulate(FlightData(h, b))
      val pad = (8 - (h.length & 7)) & 7
      assert((8 + h.length + pad) % 8 == 0) // body starts aligned
      val (h2, b2) = FlightServer.splitIpc(chunk)
      assert(h2.length == h.length + pad)
      assert(h2.take(h.length).toSeq == h.toSeq)
      assert(h2.drop(h.length).forall(_ == 0)) // zero padding, nothing else
      assert(b2.toSeq == b.toSeq)
      // padded header re-encapsulates to the identical chunk (Spark path)
      assert(FlightResult.encapsulate(FlightData(h2, b2)).toSeq == chunk.toSeq)
    }
  }

  test("property: varint field lengths at size-class boundaries") {
    // 127/128 and 16383/16384 are the 1→2 and 2→3 varint byte boundaries
    for (n <- Seq(0, 1, 127, 128, 129, 16383, 16384, 16385)) {
      val payload = Array.fill(n)(42.toByte)
      val back = Ticket.fromBytes(Ticket(payload).toBytes)
      assert(back.ticket.length == n)
      assert(back.ticket.forall(_ == 42.toByte))
    }
  }
}
